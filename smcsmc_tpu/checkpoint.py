"""Checkpoint/resume.

Two layers, mirroring SURVEY.md §5.4:
- iteration-level idempotent resume (reference: model.py:949-959
  ``have_outfile`` + :1105-1115 skip-if-done): a finished EM iteration is
  detected by a parseable ``emiterN/chunkfinal.out`` containing a LogL row,
  and is skipped on re-run;
- mid-sweep state checkpointing via orbax: the full PFState pytree
  (particle tensors, weights, rings, accumulators, RNG key) plus the model
  parameters, saved at block boundaries.
"""

from __future__ import annotations

import os

import numpy as np


def have_outfile(outdir: str, iteration: int) -> bool:
    """True iff the iteration's merged .out exists and contains LogL."""
    path = os.path.join(outdir, f"emiter{iteration}", "chunkfinal.out")
    if not os.path.exists(path):
        return False
    try:
        with open(path) as fh:
            return any(" LogL " in line or "\tLogL\t" in line for line in fh)
    except OSError:
        return False


def load_iteration(outdir: str, iteration: int):
    """Parse a finished iteration's .out back into aggregation form."""
    from .outfmt import parse_outfile

    return parse_outfile(os.path.join(outdir, f"emiter{iteration}", "chunkfinal.out"))


def save_state(path: str, state, demo=None) -> None:
    """Save a PFState (+ optional model parameters) with orbax."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {"state": state}
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()
    if demo is not None:
        np.savez(
            os.path.abspath(path) + ".demo.npz",
            change_times=demo.change_times,
            pop_sizes=demo.pop_sizes,
            mig_rates=demo.mig_rates,
            mutation_rate=demo.mutation_rate,
            recombination_rate=demo.recombination_rate,
            sequence_length=demo.sequence_length,
            n0=demo.n0,
            sample_pops=demo.sample_pops,
            sample_times=demo.sample_times,
        )


def load_state(path: str, template):
    """Restore a PFState saved by :func:`save_state`; ``template`` is a
    matching abstract/concrete pytree (e.g. from ``init_state``)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), {"state": template})
    return restored["state"]


def load_demo(path: str):
    from .demography import Demography

    z = np.load(os.path.abspath(path) + ".demo.npz")
    return Demography(
        change_times=z["change_times"],
        pop_sizes=z["pop_sizes"],
        mig_rates=z["mig_rates"],
        sample_pops=z["sample_pops"],
        sample_times=z["sample_times"],
        mutation_rate=float(z["mutation_rate"]),
        recombination_rate=float(z["recombination_rate"]),
        sequence_length=float(z["sequence_length"]),
        n0=float(z["n0"]),
    )

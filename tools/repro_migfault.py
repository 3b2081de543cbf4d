#!/usr/bin/env python
"""Reproducer for the TPU migration-sweep kernel fault envelope.

Bisected 2026-08-21 on the axon v5e (loop-walk program,
``SMCSMC_MIG_WALK=loop``): the compiled migration sweep faults the TPU
worker whenever ``num_particles x scan_length >= 2^20`` exactly —
4096x255 runs, 4096x256 (= 2^20) crashes; the plain no-migration sweep is
unaffected at 10000x2048.  ``em.run_chunk`` caps ``P x block <= 2^19`` on
accelerators for migration configs (em.py, "TPU runtime hazard").

Usage (each probe runs in a FRESH subprocess so a worker crash doesn't
take the probe loop down):

    python tools/repro_migfault.py                    # probe the envelope
    python tools/repro_migfault.py --impl jump        # probe the new walk
    python tools/repro_migfault.py --one 4096 256     # single in-process run

Exit code of ``--one``: 0 = sweep completed, nonzero = crash (what the
envelope test asserts on).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(num_particles: int, scan_length: int, impl: str) -> None:
    """Build and run ONE compiled migration sweep block of the given shape
    (in-process; crashes the interpreter if the runtime faults)."""
    os.environ["SMCSMC_MIG_WALK"] = impl
    sys.path.insert(0, _HERE)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smcsmc_tpu.demography import Demography
    from smcsmc_tpu.em import prepare_blocks
    from smcsmc_tpu.kernels.tree import epochs_from_demography
    from smcsmc_tpu.simulate import simulate_seg
    from smcsmc_tpu.smc import (
        PFConfig, build_sweep, default_lags, init_state,
    )

    num_epochs, m = 8, 5e-5
    change = np.concatenate([[0.0], np.logspace(2.5, 5.0, num_epochs - 1)])
    mig = np.zeros((num_epochs, 2, 2))
    mig[:, 0, 1] = m
    mig[:, 1, 0] = m
    demo = Demography(
        change_times=change,
        pop_sizes=np.full((num_epochs, 2), 10000.0),
        mig_rates=mig,
        sample_pops=np.array([0, 0, 1, 1], dtype=np.int32),
        mutation_rate=1e-8,
        recombination_rate=1e-9,
        sequence_length=4e6,
    )
    seg = simulate_seg(demo, seed=13)
    epochs = epochs_from_demography(demo)
    rho = demo.recombination_rate
    lags = jnp.asarray(default_lags(epochs, rho))
    cfg = PFConfig(num_particles=num_particles, num_leaves=4,
                   has_migration=True)
    state = init_state(jax.random.PRNGKey(0), epochs, cfg, demo.sample_pops,
                       rho)
    sweep = build_sweep(cfg)
    blocks = list(
        prepare_blocks(seg, scan_length, int(seg.positions[0]))
    )
    blk = blocks[0]
    assert blk[0].shape[0] == scan_length, blk[0].shape
    st, _ = sweep(state, blk, epochs, demo.mutation_rate, rho, lags)
    jax.block_until_ready(st.ln_norm)
    print(f"OK impl={impl} P={num_particles} S={scan_length} "
          f"P*S={num_particles * scan_length} ln={float(st.ln_norm):.3f}")


def probe(num_particles: int, scan_length: int, impl: str,
          timeout: int = 1800) -> bool:
    """Run one shape in a fresh subprocess; True if it completed."""
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--impl", impl,
         "--one", str(num_particles), str(scan_length)],
        capture_output=True, text=True, timeout=timeout,
    )
    ok = r.returncode == 0 and "OK " in r.stdout
    tail = "" if ok else (r.stderr or "")[-200:].replace("\n", " | ")
    print(f"{'PASS' if ok else 'FAIL'} impl={impl} P={num_particles} "
          f"S={scan_length} P*S={num_particles * scan_length} {tail}")
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="loop", choices=["loop", "jump"])
    ap.add_argument("--one", nargs=2, type=int, metavar=("P", "S"),
                    help="run one shape in-process (crashes on fault)")
    args = ap.parse_args()
    if args.one:
        run_one(args.one[0], args.one[1], args.impl)
        return
    if args.impl == "loop":
        # the bisected loop boundary: the last shape is exactly 2^20
        shapes = [(1000, 512), (4096, 128), (4096, 255), (4096, 256)]
    else:
        # jump-walk bracket (2026-08-22): clean through 10000x1024
        # (1.02e7), crashes at 10000x2048 (2.05e7)
        shapes = [(4096, 256), (10000, 512), (10000, 1024), (10000, 2048)]
    for p, s in shapes:
        probe(p, s, args.impl)


if __name__ == "__main__":
    main()

"""Benchmark: particle-site updates/s/chip (BASELINE.json metric).

Runs the particle-filter sweep on simulated single-population data and
reports throughput = num_particles * segments_processed / wall_clock.
Prints ONE JSON line.

Each particle-count attempt runs in a fresh subprocess: a TPU device fault
poisons the runtime for the rest of the process, so in-process fallback
would fail even at particle counts that work in a clean process
(round-1 lesson: BENCH_r01.json recorded nothing for exactly this reason).

Baselines (BASELINE.md: the reference publishes no numbers, so every anchor
must be derived and labeled):

1. ``vs_baseline`` keeps the round-2 convention: the generous reference
   C++ proxy of 1e5 updates/s/core.  Derivation: the reference CI runs
   1e7 bp at Np=1000 within 1300 s on one core
   (test_const_pop_size.py:17-32, run_tests.sh:4); at theta = 4*1e4*1e-8
   that is ~4.6e3 segregating sites, giving a *demonstrated floor* of
   1000 * 4600 / 1300 ~= 3.5e3 updates/s/core; the proxy multiplies the
   floor by ~30 assuming the CI test passes well inside its bound.
2. ``cpu_updates_per_sec`` is MEASURED (not asserted): this framework's own
   sweep, identical model/data, run on ONE pinned CPU core at Np=1000 (the
   reference's CI particle count).  ``vs_cpu_1core`` is the real
   TPU-chip-vs-CPU-core ratio for this exact workload.
3. ``reference_floor_updates_per_sec`` = 3.5e3, the hard floor from (1);
   ``vs_reference_floor`` reports against it.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_UPDATES_PER_SEC = 1.0e5  # generous C++ single-core proxy (see above)
REFERENCE_FLOOR_UPDATES_PER_SEC = 3.5e3  # demonstrated CI floor (see above)


def run_attempt(P: int) -> dict | None:
    """Run one bench attempt in a fresh subprocess; None on failure."""
    code = f"""
import json, sys, time
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
import numpy as np
from smcsmc_tpu._cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import prepare_blocks
from smcsmc_tpu.kernels.tree import epochs_from_demography
from smcsmc_tpu.simulate import simulate_seg
from smcsmc_tpu.smc import PFConfig, build_sweep, default_lags, init_state

P = {P}
n = 4
L = 2e6
num_epochs = 8
change = np.concatenate([[0.0], np.logspace(2.5, 5.0, num_epochs - 1)])
demo = Demography(
    change_times=change,
    pop_sizes=np.full((num_epochs, 1), 10000.0),
    mig_rates=np.zeros((num_epochs, 1, 1)),
    sample_pops=np.zeros(n, dtype=np.int32),
    mutation_rate=1e-8,
    recombination_rate=1e-9,
    sequence_length=L,
)
seg = simulate_seg(demo, seed=11)
epochs = epochs_from_demography(demo)
rho = demo.recombination_rate
lags = jnp.asarray(default_lags(epochs, rho))
cfg = PFConfig(num_particles=P, num_leaves=n)
state = init_state(jax.random.PRNGKey(0), epochs, cfg, demo.sample_pops, rho)
sweep = build_sweep(cfg)
def run(st, blk):
    return sweep(st, blk, epochs, demo.mutation_rate, rho, lags)
blocks = list(prepare_blocks(seg, 256, int(seg.positions[0])))
st, _ = run(state, blocks[0])  # warmup/compile
jax.block_until_ready(st.ln_norm)
t0 = time.time()
total_segments = 0
st = state
for blk in blocks:
    st, _ = run(st, blk)
    total_segments += int(blk[0].shape[0])
jax.block_until_ready(st.ln_norm)
dt = time.time() - t0
print("BENCH_RESULT " + json.dumps({{
    "segments": total_segments, "wall_clock_s": dt,
    "ln_norm": float(st.ln_norm), "device": str(jax.devices()[0]),
}}))
"""
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=3000,
        )
    except subprocess.TimeoutExpired:
        print(f"# bench attempt P={P} timed out", file=sys.stderr)
        return None
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            return json.loads(line[len("BENCH_RESULT "):])
    tail = (out.stderr or "")[-500:]
    print(f"# bench attempt P={P} failed rc={out.returncode}: {tail!r}",
          file=sys.stderr)
    return None


def run_cpu_anchor(P: int = 1000, max_blocks: int = 2) -> dict | None:
    """Measure this framework's own sweep on ONE pinned CPU core (VERDICT r2
    item 2: a measured, falsifiable baseline).  Np=1000 matches the
    reference's CI config (test_const_pop_size.py:17-32).  Runs in a fresh
    subprocess with the affinity restricted to a single core."""
    code = f"""
import json, os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PYTHONPATH"] = {os.path.dirname(os.path.abspath(__file__))!r}
try:
    os.sched_setaffinity(0, {{0}})
except (AttributeError, OSError):
    pass
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
import numpy as np
import jax, jax.numpy as jnp
from smcsmc_tpu.demography import Demography
from smcsmc_tpu.em import prepare_blocks
from smcsmc_tpu.kernels.tree import epochs_from_demography
from smcsmc_tpu.simulate import simulate_seg
from smcsmc_tpu.smc import PFConfig, build_sweep, default_lags, init_state

P = {P}
n = 4
L = 2e6
num_epochs = 8
change = np.concatenate([[0.0], np.logspace(2.5, 5.0, num_epochs - 1)])
demo = Demography(
    change_times=change,
    pop_sizes=np.full((num_epochs, 1), 10000.0),
    mig_rates=np.zeros((num_epochs, 1, 1)),
    sample_pops=np.zeros(n, dtype=np.int32),
    mutation_rate=1e-8,
    recombination_rate=1e-9,
    sequence_length=L,
)
seg = simulate_seg(demo, seed=11)
epochs = epochs_from_demography(demo)
rho = demo.recombination_rate
lags = jnp.asarray(default_lags(epochs, rho))
cfg = PFConfig(num_particles=P, num_leaves=n)
state = init_state(jax.random.PRNGKey(0), epochs, cfg, demo.sample_pops, rho)
sweep = build_sweep(cfg)
def run(st, blk):
    return sweep(st, blk, epochs, demo.mutation_rate, rho, lags)
blocks = list(prepare_blocks(seg, 256, int(seg.positions[0])))[: {max_blocks}]
st, _ = run(state, blocks[0])  # warmup/compile
jax.block_until_ready(st.ln_norm)
t0 = time.time()
total_segments = 0
st = state
for blk in blocks:
    st, _ = run(st, blk)
    total_segments += int(blk[0].shape[0])
jax.block_until_ready(st.ln_norm)
dt = time.time() - t0
print("CPU_RESULT " + json.dumps({{
    "segments": total_segments, "wall_clock_s": dt, "num_particles": P,
}}))
"""
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=1200,
            env={**os.environ, "JAX_PLATFORMS": "cpu",
                 "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))},
        )
    except subprocess.TimeoutExpired:
        print("# cpu anchor timed out", file=sys.stderr)
        return None
    for line in out.stdout.splitlines():
        if line.startswith("CPU_RESULT "):
            return json.loads(line[len("CPU_RESULT "):])
    print(f"# cpu anchor failed: {(out.stderr or '')[-300:]!r}", file=sys.stderr)
    return None


def main():
    P_req = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    for P in [P_req, P_req // 2, P_req // 5, 1000, 500]:
        if P < 1:
            continue
        res = run_attempt(P)
        if res is not None:
            break
    else:
        raise SystemExit("all bench attempts failed")

    updates_per_sec = P * res["segments"] / res["wall_clock_s"]

    cpu = run_cpu_anchor()
    cpu_ups = (
        cpu["num_particles"] * cpu["segments"] / cpu["wall_clock_s"]
        if cpu
        else None
    )
    print(
        json.dumps(
            {
                "metric": "particle_site_updates_per_sec_per_chip",
                "value": float(updates_per_sec),
                "unit": "particle-site updates/s",
                "vs_baseline": float(updates_per_sec / BASELINE_UPDATES_PER_SEC),
                "detail": {
                    "num_particles": P,
                    "requested_particles": P_req,
                    "segments": res["segments"],
                    "wall_clock_s": res["wall_clock_s"],
                    "n_haplotypes": 4,
                    "epochs": 8,
                    "sequence_bp": 2e6,
                    "device": res["device"],
                    "baseline_proxy_updates_per_sec": BASELINE_UPDATES_PER_SEC,
                    "cpu_updates_per_sec": cpu_ups,
                    "cpu_anchor": cpu,
                    "vs_cpu_1core": (
                        float(updates_per_sec / cpu_ups) if cpu_ups else None
                    ),
                    "reference_floor_updates_per_sec":
                        REFERENCE_FLOOR_UPDATES_PER_SEC,
                    "vs_reference_floor": float(
                        updates_per_sec / REFERENCE_FLOOR_UPDATES_PER_SEC
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

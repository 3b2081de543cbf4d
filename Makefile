# Test env notes:
# - JAX_PLATFORMS=cpu keeps tests off the single-client TPU tunnel.
# - PYTHONPATH is cleared of /root/.axon_site: its sitecustomize dials the
#   TPU relay at interpreter startup and intermittently blocks for minutes.
# - Run test jobs SERIALLY; concurrent XLA compiles thrash the small CPU.

PY := env PYTHONPATH=$(CURDIR) JAX_PLATFORMS=cpu python

native: smcsmc_tpu/_segscan.so smcsmc_tpu/_lookahead.so

# portable codegen (no -march=native): the .so may outlive the build host,
# and the ctypes loaders fall back to Python oracles on load failure anyway
smcsmc_tpu/_segscan.so: native/segscan.c
	gcc -O3 -shared -fPIC -o $@ $<

smcsmc_tpu/_lookahead.so: native/lookahead.c
	gcc -O3 -shared -fPIC -o $@ $<

test:
	$(PY) -m pytest tests/ -x -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -x -q

bench:
	python bench.py

# TPU smoke tier: ONE serial pytest job against the real device (run after
# any TPU-touching change; the tunnel is single-client).  Includes the
# reference-precision statistical gates (test_tpu_stat_gates.py) — first
# run compiles several shapes (~10-20 min via the tunnel); warm-cache runs
# take a few minutes.
tpu-smoke:
	env PYTHONPATH=$(CURDIR):$(PYTHONPATH) SMCSMC_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py tests/test_tpu_stat_gates.py -x -q

# fault-envelope regression (tools/repro_migfault.py): runs its own TPU
# subprocess, so it must NOT share the single-client tunnel with a pytest
# session — run it standalone, never concurrently with another TPU job
tpu-envelope:
	env PYTHONPATH=$(CURDIR):$(PYTHONPATH) SMCSMC_TPU_TESTS=1 SMCSMC_ENVELOPE=1 python -m pytest tests/test_migration_walk.py -x -q -k envelope

.PHONY: test test-all bench native tpu-smoke tpu-envelope

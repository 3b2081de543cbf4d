#!/bin/bash
# Serialize TPU access: the axon relay is single-client and holds stale
# grants briefly after a client exits (esp. after SIGKILL).  Probe with a
# tiny jit until the relay grants a session, then run the real job.
# Usage: tools/tpu_run.sh <timeout_s> <script.py> [args...]
T=${1:-600}; shift
for i in $(seq 1 40); do
  ok=$(timeout 60 python -c "import jax; jax.jit(lambda x: x*2)(jax.numpy.ones(8)); print('TPU_OK')" 2>/dev/null | grep -c TPU_OK)
  [ "$ok" = "1" ] && break
  sleep 15
done
exec timeout "$T" python "$@"

#!/bin/bash
# robust TPU runner: wait for relay liveness, then run the command with a
# hard-kill timeout; retry the whole thing on failure.
# usage: run_tpu.sh <budget_s> <cmd...>
BUDGET=$1; shift
probe() {
  timeout -k 10 90 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() != 'cpu'
x = jnp.ones((128,128)); print(float(jnp.sum(x@x)))" >/dev/null 2>&1
}
for attempt in 1 2 3; do
  until probe; do
    echo "[run_tpu] relay down, waiting 60s ($(date -u +%H:%M))"
    sleep 60
  done
  echo "[run_tpu] relay ok, attempt $attempt: $* ($(date -u +%H:%M))"
  timeout -k 30 "$BUDGET" "$@" && exit 0
  echo "[run_tpu] attempt $attempt failed/timed out ($(date -u +%H:%M))"
done
exit 1

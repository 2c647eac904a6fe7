#!/bin/bash
# Poll the axon TPU relay until a trivial computation succeeds, then exit 0.
# Each probe runs in a fresh subprocess (a hung backend init can't be timed
# out in-process). Exit 1 after MAX_MIN minutes of failures.
MAX_MIN=${MAX_MIN:-600}
SLEEP=${SLEEP:-180}
start=$(date +%s)
attempt=0
while true; do
  attempt=$((attempt + 1))
  if timeout 240 python -c "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,8)))))" >/dev/null 2>&1; then
    echo "TPU LIVE after $attempt attempts ($(date))"
    exit 0
  fi
  now=$(date +%s)
  if [ $(( (now - start) / 60 )) -ge "$MAX_MIN" ]; then
    echo "TPU still down after $MAX_MIN min ($(date))"
    exit 1
  fi
  echo "attempt $attempt: down ($(date))"
  sleep "$SLEEP"
done

#!/usr/bin/env bash
# The axon TPU tunnel in this container wedges intermittently (a device
# future or remote compile never completes; the client blocks forever with
# zero CPU). This harness retries a device measurement until one attempt
# completes: cheap health probe first, then the real command under
# `timeout`, sleeping between attempts so the relay can recover.
#
#   bash scripts/tpu_retry_bench.sh <out_file> <attempt_timeout_s> \
#        <max_attempts> -- <command...>
set -u
OUT=${1:?out file}
ATT_T=${2:?attempt timeout}
MAX=${3:?max attempts}
shift 3
[ "${1:-}" = "--" ] && shift

for i in $(seq 1 "$MAX"); do
  echo "[retry $i/$MAX] probe" >&2
  if ! timeout 90 python -c "
import jax, jax.numpy as jnp
jax.devices()
x = jnp.ones((256, 256))
jax.jit(lambda a: a @ a)(x).block_until_ready()
print('probe-ok')" >/dev/null 2>&1; then
    echo "[retry $i/$MAX] tunnel unhealthy, sleeping 180s" >&2
    sleep 180
    continue
  fi
  echo "[retry $i/$MAX] running: $*" >&2
  if timeout "$ATT_T" "$@" > "$OUT" 2>&1; then
    echo "[retry $i/$MAX] success" >&2
    exit 0
  fi
  echo "[retry $i/$MAX] attempt failed/timed out, sleeping 180s" >&2
  sleep 180
done
echo "[retry] exhausted $MAX attempts" >&2
exit 1

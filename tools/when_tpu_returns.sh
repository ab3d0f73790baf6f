#!/usr/bin/env bash
# Tunnel-recovery runbook: the hardware validations that were pending when
# the TPU tunnel died 2026-08-18 (PERF.md "Round 3: blockwise flash
# attention", CLAUDE.md round-3 notes).  Everything is SERIALIZED (two
# processes corrupt the tunneled chip) and subprocess-isolated with
# timeouts so a re-wedge aborts instead of hanging.
#
#   bash tools/when_tpu_returns.sh [--skip-bench]
#
# Writes logs under /tmp/tpu_return/.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
LOGDIR=/tmp/tpu_return
mkdir -p "$LOGDIR"

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then echo "    OK"; else
    echo "    FAILED rc=$rc — tail of $LOGDIR/$name.log:"
    tail -5 "$LOGDIR/$name.log" | sed 's/^/    /'
    [ $rc -eq 124 ] && echo "    (timeout: tunnel likely still wedged — stop here)" && exit 124
  fi
  return 0
}

# 1. Is the tunnel actually back?  (dispatch probe, not just device init)
# A cold tunnel can take several 60s-deadline attempts before the first
# dispatch completes (observed 2026-08-19: bench.py recovered on attempt
# 5) — retry on a backoff loop like bench.py::_require_compute does.
step probe 600 python -c "
import sys, time, threading
import jax, jax.numpy as jnp

def once(timeout_s=60.0):
    done, err = threading.Event(), []
    def f():
        try:
            x = jnp.ones((256, 256))
            assert float(jax.jit(jnp.sum)(jax.jit(jnp.matmul)(x, x))) == 256.0**3
        except BaseException as e:
            err.append(e)
        finally:
            done.set()
    threading.Thread(target=f, daemon=True).start()
    if not done.wait(timeout_s):
        return False
    if err:
        raise err[0]
    return True

deadline = time.monotonic() + 540
attempt = 0
while True:
    attempt += 1
    # Escalating deadlines: the tunnel has a SLOW-NOT-DEAD state where a
    # fresh process's first dispatch takes ~171s (measured 2026-08-19) —
    # fixed short probes kill attempts that would have succeeded.
    probe_s = min(60.0 * (2 ** (attempt - 1)),
                  max(deadline - time.monotonic(), 60.0))
    if once(probe_s):
        print('tunnel alive (attempt %d):' % attempt, jax.devices())
        break
    if time.monotonic() >= deadline:
        print('tunnel still wedged after %d probes' % attempt, file=sys.stderr)
        import os; os._exit(124)
    print('probe attempt %d (%.0fs) failed; retrying in 30s' % (attempt, probe_s), file=sys.stderr)
    time.sleep(30)
import os; os._exit(0)  # wedged daemon threads must not hang exit"

# 2. Flash attention: compiled-Mosaic == composition on real hardware.
step flash_parity 1800 python -m pytest \
  tests/test_flash_attention.py::test_flash_compiled_on_tpu_matches_composition -x -q

# 3. Raw kernel sweep (fills the PERF.md flash table).
step flash_sweep 3600 python tools/bench_flash_attention.py

# 4. End-to-end long-L audio train step A/B.
step audio_long 3600 python tools/bench_audio_long.py

# 5. AR decode batch sweep (refreshes the PERF.md AR scaling table;
# CLOSED 2026-08-20 on a healthy tunnel: peak 122.8k tokens/s at batch
# 1024, batch 2048 regresses ~7% — sweep 2048 too to re-check the knee).
step ar_sweep 1800 python tools/bench_ar_generation.py --batches 256,512,1024,2048

# 6. North-star bench (has its own device/compute watchdogs).
if [ "${1:-}" != "--skip-bench" ]; then
  step bench 3600 python bench.py
fi

echo "=== done; logs in $LOGDIR — paste numbers into PERF.md flash section ==="
echo "If a quality-convergence run was interrupted (QUALITY.md), resume it —"
echo "the same command continues the curve from the last chunk's checkpoint:"
echo "  python tools/quality_convergence.py --rows 20480 --tasks <task> --out quality_r5"

# Quiet-box guard (r16 verdict #5), sourced by measurement launchers.
# The r16 sf100 sweep's first ~50 min overlapped the round's own
# test/gate JVMs and inflated early steadies up to ~3x on identical
# code (tfidf 288.8 in-sweep vs 94.7 standalone x3) — a contaminated
# artifact costs a round of re-diagnosis. Refuse to start while ANY
# other JVM is alive; QUIET_OVERRIDE=1 downgrades to a loud warning.
quiet_guard() {
  local others
  others=$(pgrep -x java || true)
  if [[ -n "$others" ]]; then
    echo "QUIET GUARD: other java process(es) running:" >&2
    ps -o pid=,etime=,args= -p $others | cut -c1-160 >&2
    if [[ "${QUIET_OVERRIDE:-0}" == "1" ]]; then
      echo "QUIET GUARD: QUIET_OVERRIDE=1 — measuring on a CONTENDED box" >&2
    else
      echo "QUIET GUARD: refusing to measure (set QUIET_OVERRIDE=1 to force)" >&2
      exit 1
    fi
  fi
}

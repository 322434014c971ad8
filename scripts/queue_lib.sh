# Shared queue plumbing. POSIX sh; source from scripts/run_*.sh.
#
# Rule (round-4 verdict weak #1, the same pathology twice): logs/ and
# logs_scratch/ are gitignored working dirs, so a queue that merely writes
# its terminal JSONs there strands the round's results — git cannot see
# them and the next round starts by archaeology. Every queue must end by
# bank-ing its terminal artifacts into committed artifacts/ and, when it
# produced a green candidate, by invoking scripts/promote_candidate.py
# (never a bare "queue complete" + grep).

ARTIFACTS=${ARTIFACTS:-artifacts}

# bank <file>... — copy terminal results into committed artifacts/.
# Missing/empty files are reported but do not abort the queue (banking is
# the LAST stage; a partial bank must still bank everything else).
bank() {
  mkdir -p "$ARTIFACTS"
  _rc=0
  for _f in "$@"; do
    if [ -s "$_f" ]; then
      cp -f "$_f" "$ARTIFACTS/" && echo "banked $_f -> $ARTIFACTS/"
    else
      echo "bank: MISSING $_f (not banked)" >&2
      _rc=1
    fi
  done
  return $_rc
}

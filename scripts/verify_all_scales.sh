#!/usr/bin/env bash
# Cross-scale oracle gate: full registry dumped at sf0.001/0.01/0.1
# (graft.tools.VerifyAllScales) + the DuckDB checker per scale.
# This is the gate that caught the r9 cross-engine ROUND-tie class —
# the driver's sf0.01-only gate structurally cannot see it.
# Usage: scripts/verify_all_scales.sh [outRoot]   (default /tmp/verify_all)
# STATUS.md quotes the three summary lines per round.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/verify_all}"

sbt -batch compile >/dev/null

JOPTS=""
for m in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
  java.util java.util.concurrent java.util.concurrent.atomic; do
  JOPTS="$JOPTS --add-opens=java.base/$m=ALL-UNNAMED"
done
JOPTS="$JOPTS --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
 --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
 --add-opens=java.base/sun.security.action=ALL-UNNAMED \
 --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

rm -rf "$OUT"
# The dump tool's exit status must not be masked by the log filter
# (ADVICE r10: `| grep ... || true` defeated pipefail, so a mid-sweep
# crash surfaced only as a confusing missing-dump-dir error from the
# checker). Log to a file, fail fast on the tool's own status, THEN
# filter the log for the summary lines.
DUMP_LOG="$(mktemp /tmp/verify_all_dump.XXXXXX.log)"
if ! SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  java -cp "target/scala-2.13/classes:/opt/spark/jars/*" $JOPTS \
  graft.tools.VerifyAllScales "$OUT" >"$DUMP_LOG" 2>&1; then
  echo "VerifyAllScales failed; last log lines:" >&2
  tail -30 "$DUMP_LOG" >&2
  exit 1
fi
grep -E "\[verify" "$DUMP_LOG" || true

# One fully-LIVE DuckDB leg per round (r11 verdict item 4): the
# committed oracle cache's self-heal can't redden a query, but a cache
# hit that AGREES with the Spark side skips DuckDB entirely — a
# poisoned committed entry (or a DuckDB version change) would green
# the builder-local gate without a single live replay. The sf0.001 and
# sf0.01 legs replay live every run (~4 min total, judge-measured);
# only the sf0.1 leg — whose six ShingleCte mines cost ~1.5 h cold —
# uses the cache. Each leg prints its mode so the round log shows the
# live/cached split explicitly.
status=0
for sf in sf0.001 sf0.01 sf0.1; do
  if [ "$sf" = "sf0.1" ]; then
    mode=cached
    out=$(python3 .claude/skills/verify/check_oracle.py "/root/testdata/$sf" "$OUT/$sf")
  else
    mode=live
    out=$(GRAFT_ORACLE_CACHE=off \
      python3 .claude/skills/verify/check_oracle.py "/root/testdata/$sf" "$OUT/$sf")
  fi
  echo "$out" | grep "^FAIL" | sed "s/^/$sf /" || true
  line=$(echo "$out" | tail -1)
  echo "$sf ($mode): $line"
  case "$line" in
    *" hash-match") n="${line%%/*}"; d="${line#*/}"; d="${d%% *}"
      [ "$n" = "$d" ] || status=1 ;;
    *) status=1 ;;
  esac
done
exit $status

#!/bin/bash
# Automated calm-hunt loop (round-13 protocol, scripted round 15):
# gauge the DuckDB denominator; the moment a gauge reads calm
# (<= $CALM_BAR seconds), run the full Spark bench and a back-to-back
# DuckDB arm — a same-session paired measurement in the same weather
# window. Logs to $LOG; artifacts per attempt under /tmp/gauge/.
#
# usage: tools/calm_hunt.sh <sfDir> <oracleDir> <maxAttempts> [calmBar] [round] [code]
#
# With [round] and [code] given (round 18), a genuinely-calm pair is
# banked INTO PAIRED.json on the spot via tools/bank_pair.py — the last
# manual step of the pair protocol (the script used to log "banked" but
# leave the artifacts for a by-hand bank_pair run; a calm window caught
# while nobody is watching now lands in the file immediately). Without
# them the old behavior stands: exit 0 with the artifacts in /tmp/gauge.
set -u
SF=$1; ORACLE=$2; MAX=$3; CALM_BAR=${4:-42.0}
BANK_ROUND=${5:-}; BANK_CODE=${6:-}
LOG=/tmp/gauge/hunt.log
mkdir -p /tmp/gauge
cd /root/repo
# Every banked numeric field goes through an actual float() parse, not a
# character-class glob: *[!0-9.]* passes digit/dot garbage like '1.2.3' or
# '.', which then crashes the later float comparisons and gets misreported
# as a weather decision ('warmup above calm bar') instead of the format
# error it is. Returns nonzero on anything float() rejects, plus the two
# values float() accepts that must never be banked as a measurement:
# 'nan' (compares False everywhere — would silently loop as 'above bar')
# and 'inf'.
is_num() {
  python3 -c "import math,sys; sys.exit(0 if math.isfinite(float(sys.argv[1])) else 1)" "$1" 2>/dev/null
}
for i in $(seq 1 "$MAX"); do
  # errored oracle queries are EXCLUDED from total_sec — a shrunken
  # denominator would read as a false calm, so any error aborts the hunt
  G=$(python3 tools/oracletime.py "$SF" "$ORACLE" 2>>"$LOG" \
      | python3 -c "
import json,sys
d = json.load(sys.stdin)
if d['errors'] > 0:
    print('ERRORS', d['errors']); sys.exit(0)
print(d['total_sec'])")
  case "$G" in ERRORS*|"")
    echo "$(date +%H:%M:%S) attempt $i gauge invalid ($G) — aborting" >> "$LOG"
    exit 2;;
  esac
  echo "$(date +%H:%M:%S) attempt $i gauge ${G}s (bar ${CALM_BAR})" >> "$LOG"
  if python3 -c "exit(0 if float('$G') <= float('$CALM_BAR') else 1)"; then
    echo "$(date +%H:%M:%S) CALM — running paired bench" >> "$LOG"
    SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
      sbt -batch "runMain graft.Bench" > "/tmp/gauge/bench_$i.log" 2>&1
    grep -o '{"metric".*}' "/tmp/gauge/bench_$i.log" | tail -1 > "/tmp/gauge/bench_$i.json"
    # a crashed bench (no metric line) is a BUILD/CODE problem, not
    # weather — abort loudly instead of burning the remaining attempts
    if ! [ -s "/tmp/gauge/bench_$i.json" ]; then
      echo "$(date +%H:%M:%S) bench produced no metric line (see bench_$i.log) — aborting" >> "$LOG"
      exit 3
    fi
    python3 tools/oracletime.py "$SF" "$ORACLE" > "/tmp/gauge/duck_$i.json" 2>>"$LOG"
    # the BANKED DuckDB arm gets the same error discipline as the gauge:
    # an errored query shrinks total_sec (false-fast denominator) and a
    # crashed run leaves no total at all — neither may be banked
    D=$(python3 -c "
import json
d = json.load(open('/tmp/gauge/duck_$i.json'))
print('ERRORS %d' % d['errors'] if d['errors'] > 0 else d['total_sec'])" 2>>"$LOG")
    # the banked arm gets the SAME numeric discipline as the bench fields
    # below — oracletime.py happens to always round a float today, but a
    # future 'None'/'nan' total must abort here, not bank silently
    if [[ "$D" == ERRORS* ]] || ! is_num "$D"; then
      echo "$(date +%H:%M:%S) banked DuckDB arm invalid (D='$D', see duck_$i.json) — aborting" >> "$LOG"
      exit 4
    fi
    B=$(python3 -c "import json; print(json.load(open('/tmp/gauge/bench_$i.json'))['value'])" 2>>"$LOG")
    W=$(python3 -c "import json; print(json.load(open('/tmp/gauge/bench_$i.json'))['warmup_sec'])" 2>>"$LOG")
    # an empty/non-numeric bench field is a CODE/FORMAT problem, not
    # weather — abort loudly instead of sleeping through the remaining
    # attempts misreporting it as 'warmup above calm bar'
    for v in "value=$B" "warmup_sec=$W"; do
      if ! is_num "${v#*=}"; then
        echo "$(date +%H:%M:%S) bench metric unparseable ($v, see bench_$i.json) — aborting" >> "$LOG"
        exit 5
      fi
    done
    echo "$(date +%H:%M:%S) PAIR attempt $i: spark=$B warmup=$W duckdb=$D" >> "$LOG"
    # keep hunting only if the bench arm caught a storm mid-run. Bank on
    # the artifact's OWN weather label, not a re-derived bar (ADVICE r16:
    # the 46.0 hardcoded here duplicated Bench.CalmWarmupBar and would
    # silently diverge if the Scala constant were recalibrated). Since r17
    # the artifact also carries gust_suspect — a calm entry-label with a
    # mid-suite gust must not be banked either.
    WTHR=$(python3 -c "
import json
d = json.load(open('/tmp/gauge/bench_$i.json'))
w = d.get('weather', 'MISSING')
if w == 'calm' and d.get('gust_suspect'):
    w = 'calm-gusted %s' % ','.join(d['gust_suspect'])
print(w)" 2>>"$LOG")
    case "$WTHR" in
      calm)
        if [ -n "$BANK_ROUND" ] && [ -n "$BANK_CODE" ]; then
          # bank_pair re-validates everything (finite floats, errors==0 on
          # both arms, the calm label against weather+gust_suspect) and
          # updates the headline only on this genuinely-calm path
          if python3 tools/bank_pair.py "/tmp/gauge/bench_$i.log" \
               "/tmp/gauge/duck_$i.json" "$BANK_ROUND" "$BANK_CODE" \
               "scripted calm_hunt pair (attempt $i, gauge ${G}s, warmup ${W}s)" \
               >> "$LOG" 2>&1; then
            echo "$(date +%H:%M:%S) calm pair banked into PAIRED.json (warmup=$W) — stopping" >> "$LOG"
            exit 0
          else
            # a bank refusal on a calm-labeled pair is a FORMAT problem —
            # artifacts stay in /tmp/gauge for diagnosis, don't burn attempts
            echo "$(date +%H:%M:%S) bank_pair refused the calm pair (see above) — aborting" >> "$LOG"
            exit 7
          fi
        fi
        echo "$(date +%H:%M:%S) calm pair caught (weather=calm warmup=$W) — bank via tools/bank_pair.py bench_$i.log duck_$i.json — stopping" >> "$LOG"
        exit 0;;
      moderate|heavy|calm-gusted*)
        echo "$(date +%H:%M:%S) bench weather=$WTHR (warmup=$W) — continuing hunt" >> "$LOG";;
      *)
        # 'unknown' (warm pass skipped — the label's precondition fails and
        # would fail every attempt) or a missing/unparseable field is a
        # CODE/FORMAT problem, not weather — abort loudly
        echo "$(date +%H:%M:%S) bench weather field unusable ('$WTHR', see bench_$i.json) — aborting" >> "$LOG"
        exit 6;;
    esac
  fi
  sleep 150
done
echo "$(date +%H:%M:%S) no calm pair in $MAX attempts" >> "$LOG"
exit 1

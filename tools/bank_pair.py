#!/usr/bin/env python3
"""Bank a calm_hunt paired measurement into PAIRED.json per the file's
contract (round 17 — mechanizes what was hand-edited in rounds 13–16):

- a new entry is PREPENDED to `samples` with spark/duckdb/ratio/weather/
  code/note;
- the HEADLINE fields (round/sf/spark_sec/duckdb_sec/ratio/
  stream_block_sec) are updated ONLY when the new pair is calm — they
  always hold the latest CALM pair, never a storm reading;
- validation mirrors calm_hunt's banking discipline: both arms must be
  finite floats, the bench artifact must carry errors == 0, and a calm
  label is cross-checked against the artifact's own `weather` field and
  an empty `gust_suspect` (a mid-suite gust under a calm warmup must not
  bank as calm).

Usage: bank_pair.py <bench_N.log> <duck_N.json> <round> <code> [note]
  bench_N.log  full sbt log of the bench arm (both artifact lines live
               there; stream_block_sec needs the total_full per-gate map)
  duck_N.json  oracletime.py output of the banked DuckDB arm
"""
import json, math, re, sys


def die(msg):
    print(f"bank_pair: {msg}", file=sys.stderr)
    sys.exit(1)


def finite(x, what):
    v = float(x)
    if not math.isfinite(v):
        die(f"{what} is not a finite number: {x!r}")
    return v


def main():
    if len(sys.argv) < 5:
        die(__doc__.strip())
    bench_log, duck_path, rnd, code = sys.argv[1:5]
    note = sys.argv[5] if len(sys.argv) > 5 else None

    lines = [m.group(0) for l in open(bench_log, encoding="utf-8")
             for m in [re.search(r'\{"metric".*\}', l)] if m]
    full = [json.loads(l) for l in lines
            if '"metric":"total_full"' in l]
    compact = [json.loads(l) for l in lines
               if re.search(r'"metric":"total"[,}]', l)]
    if not full or not compact:
        die(f"no artifact lines found in {bench_log}")
    full, compact = full[-1], compact[-1]

    if compact.get("errors", 1) != 0:
        die(f"bench arm has errors={compact.get('errors')} — not bankable")
    spark = finite(compact["value"], "bench value")
    warmup = finite(compact["warmup_sec"], "warmup_sec")
    # format discipline mirrors calm_hunt's exit-6 path (ADVICE r17): a
    # pre-r17 log has no weather field at all, and 'unknown' means the warm
    # pass was skipped — neither may bank a sample whose label would read
    # as a weather statement
    if "weather" not in compact:
        die("compact line lacks 'weather' (pre-r17 log?) — not bankable")
    weather = compact["weather"]
    if not weather or weather == "unknown":
        die(f"compact weather unusable ({weather!r}) — not bankable")
    # gust_suspect absent (the minimal fit-guard rung drops it) is weaker
    # than gusts==[]: warn and bar the HEADLINE — a gusted run could hide
    # behind the missing field — but still bank the sample honestly
    gusts = compact.get("gust_suspect")
    gust_field_present = gusts is not None
    if not gust_field_present:
        print("bank_pair: warning: compact line lacks 'gust_suspect' "
              "(minimal fit-guard line?) — sample banked, headline "
              "ineligible", file=sys.stderr)
        gusts = []
    if gusts:
        # the artifact's entry label is a floor; a gusted run must carry
        # the gust in its banked label (calm_hunt refuses calm-gusted
        # pairs — mirror it here so a manual bank can't slip one through,
        # and annotate moderate/heavy the same way for honest samples)
        weather = f"{weather}-gusted " + ",".join(gusts)

    duck = json.load(open(duck_path))
    if duck.get("errors", 1) != 0:
        die(f"DuckDB arm has errors={duck.get('errors')} — not bankable")
    duckdb_sec = finite(duck["total_sec"], "duckdb total_sec")
    if duckdb_sec <= 0:
        die(f"degenerate DuckDB total {duckdb_sec}")

    ratio = round(spark / duckdb_sec, 3)
    stream_block = round(sum(
        v for k, v in full["queries"].items()
        if k.startswith("stream_") and isinstance(v, (int, float))), 2)

    entry = {"spark": round(spark, 2), "duckdb": round(duckdb_sec, 2),
             "ratio": ratio, "weather": weather, "code": code}
    # storm-robust secondary estimator (round 18): bank the artifact's own
    # gust-corrected composite alongside the raw sample so a storm pair
    # carries its corrected numerator — the HEADLINE stays calm-only
    corr = compact.get("value_gust_corrected")
    if corr is not None:
        corr = finite(corr, "value_gust_corrected")
        if corr >= 0:
            entry["spark_gust_corrected"] = round(corr, 2)
            entry["ratio_gust_corrected"] = round(corr / duckdb_sec, 3)
    if note:
        entry["note"] = note

    paired = json.load(open("PAIRED.json"))
    paired["samples"].insert(0, entry)
    if weather == "calm" and gust_field_present:
        paired.update(round=int(rnd),
                      sf=full["sf"].rstrip("/").rsplit("/", 1)[-1],
                      spark_sec=round(spark, 2),
                      duckdb_sec=round(duckdb_sec, 2),
                      ratio=ratio, stream_block_sec=stream_block)
    with open("PAIRED.json", "w") as f:
        json.dump(paired, f, indent=1)
        f.write("\n")
    print(f"banked: spark={spark:.2f} duckdb={duckdb_sec:.2f} "
          f"ratio={ratio} weather={weather} warmup={warmup:.1f} "
          f"stream_block={stream_block}"
          + (" [headline updated]"
             if weather == "calm" and gust_field_present else ""))


if __name__ == "__main__":
    main()

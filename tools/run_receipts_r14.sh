#!/bin/bash
# Round-14 receipt sequence (run on a QUIET box, one stage at a time):
#   1. clean full-suite bench at sf0.1            -> BENCH_DETAIL_r14.json
#   2. build 10x/100x replicas                    -> /tmp/sf1x10, /tmp/sf1x100
#   3. full-suite bench at 10x                    -> /tmp/scaled10.json
#   4. full-suite bench at 100x (r11 exclusions)  -> /tmp/scaled100.json
#   5. SmokeProbes at all three scales            -> /tmp/probes_{base,10,100}.json
#   6. Probe (mjpeg split) at base + 100x         -> BENCH_PROBE.json
#   7. assemble                                   -> SCALE_SMOKE_r14.json
set -euo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")/.."
STAGE="${1:?usage: run_receipts_r14.sh <stage 1..7>}"

case "$STAGE" in
1)
  SPARK_GRAFT_BENCH_OUT=BENCH_DETAIL_r14.json tools/run.sh graft.Bench
  ;;
2)
  python3 tools/make_scale_smoke.py /root/testdata/sf0.1 /tmp/sf1x10 10
  python3 tools/make_scale_smoke.py /root/testdata/sf0.1 /tmp/sf1x100 100
  ;;
3)
  SPARK_GRAFT_SF_DIR=/tmp/sf1x10 SPARK_GRAFT_BENCH_OUT=/tmp/scaled10.json \
    tools/run.sh graft.Bench
  ;;
4)
  # r11 exclusions, same justifications: uncapped llm_near_dedup (env-gated
  # off by default), all-pairs truth consumers (llm_lsh_calibration,
  # llm_split_leakage), fixture-label llm_semdedup, unscaled-lineitem q1/q3.
  ONLY="$(python3 - <<'EOF'
import json
q = json.load(open('BENCH_DETAIL_r14.json'))['queries']
excl = {'llm_lsh_calibration', 'llm_split_leakage', 'llm_semdedup',
        'q1_pricing_summary', 'q3_shipping_priority', 'anchor_cpu', 'anchor_io'}
print(','.join(sorted(k for k in q if k not in excl)))
EOF
)"
  SPARK_GRAFT_SF_DIR=/tmp/sf1x100 SPARK_GRAFT_BENCH_OUT=/tmp/scaled100.json \
    SPARK_GRAFT_ONLY="$ONLY" tools/run.sh graft.Bench
  ;;
5)
  tools/run.sh graft.tools.SmokeProbes /root/testdata/sf0.1 /tmp/probes_base.json
  tools/run.sh graft.tools.SmokeProbes /tmp/sf1x10 /tmp/probes_10.json
  tools/run.sh graft.tools.SmokeProbes /tmp/sf1x100 /tmp/probes_100.json
  python3 - <<'EOF'
import json
out = {k: json.load(open(f)) for k, f in [
    ("sf0.1", "/tmp/probes_base.json"),
    ("sf1x10", "/tmp/probes_10.json"),
    ("sf1x100", "/tmp/probes_100.json")]}
json.dump(out, open("/tmp/probes_all.json", "w"), indent=1)
print("probes merged")
EOF
  ;;
6)
  SPARK_GRAFT_PROBE_OUT=/tmp/probe_base.json tools/run.sh graft.tools.Probe
  SPARK_GRAFT_SF_DIR=/tmp/sf1x100 SPARK_GRAFT_PROBE_OUT=/tmp/probe_100.json \
    tools/run.sh graft.tools.Probe
  python3 - <<'EOF'
import json
out = {"metric": "mjpeg_split", "unit": "sec",
       "note": ("fixture ENCODE (PNG/JPEG payload synthesis) vs full "
                "encode+demux+decode, base and 100x; the operator's scaled "
                "cost is decode_attributed_*"),
       "sf0.1": json.load(open("/tmp/probe_base.json")),
       "sf1x100": json.load(open("/tmp/probe_100.json"))}
json.dump(out, open("BENCH_PROBE.json", "w"), indent=1)
print("BENCH_PROBE.json written")
EOF
  ;;
7)
  SUBSET="$(python3 -c "
import json
print(','.join(sorted(json.load(open('/tmp/scaled100.json'))['queries'])))")"
  python3 tools/assemble_smoke2.py BENCH_DETAIL_r14.json /tmp/scaled10.json \
    /tmp/scaled100.json SCALE_SMOKE_r14.json --subset "$SUBSET" \
    --probes /tmp/probes_all.json \
    --note10 "ONE full-suite sweep under the shipped scan config (maxPartitionBytes=8m, openCostInBytes=256k); includes the r13 additions (nerd_idea_both single-parse both-sides consumer, idx1-sampled video demux) measured in-suite." \
    --note100 "Same sweep discipline as smoke_10x. Exclusions (5), same justifications as r11: llm_lsh_calibration and llm_split_leakage consume the deliberately uncapped all-pairs truth (their scale-capable siblings llm_lsh_calibration_sampled / llm_split_leakage_lsh ARE in this set); llm_semdedup's fixture labels collapse under replication (production path llm_semdedup_kmeans IS in this set); q1/q3 read lineitem, which the replicator does not scale."
  ;;
*) echo "unknown stage $STAGE" >&2; exit 1 ;;
esac

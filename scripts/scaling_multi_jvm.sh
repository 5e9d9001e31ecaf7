#!/usr/bin/env bash
# Cluster-size scaling proxy with SEPARATE JVMs — the honest model of
# "N executors -> 4N executors": executors are independent JVM processes
# with their own heaps, unlike threads sharing one heap/GC. Measures
#   (a) one 8-thread JVM over D docs            -> thr_1
#   (b) four concurrent 8-thread JVMs, D each   -> thr_4 (aggregate 4D/T)
# and reports efficiency = thr_4 / (4 * thr_1).
set -euo pipefail
cd "$(dirname "$0")/.."
DOCS="${1:-400000}"
export GRAFT_EXTRA_JAVA_OPTS="${GRAFT_EXTRA_JAVA_OPTS:--Xms8g -XX:+AlwaysPreTouch}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-8g}"

sbt -batch compile -warn >/dev/null

run_one() {
  sbt -batch "runMain graft.tools.ScalingBench single 8 $DOCS" 2>/dev/null \
    | grep -o 'secs=[0-9.]*' | cut -d= -f2
}

echo "== phase 1: single 8-thread JVM =="
T1=$(run_one)
echo "single-jvm secs=$T1"

echo "== phase 2: four concurrent 8-thread JVMs =="
START=$(date +%s.%N)
for i in 1 2 3 4; do
  sbt -batch "runMain graft.tools.ScalingBench single 8 $DOCS" \
    > "/tmp/scaling_jvm_$i.log" 2>&1 &
done
wait
END=$(date +%s.%N)
T4=$(python3 -c "print($END-$START)")
# subtract a measured sbt+warmup cost? No: use the slowest child's own
# measured secs (each log line reports pure measured job time)
CH=$(grep -ho 'secs=[0-9.]*' /tmp/scaling_jvm_*.log | cut -d= -f2 | sort -n | tail -1)
echo "four-jvm wall=${T4}s slowest-child-measured=${CH}s"

python3 - "$DOCS" "$T1" "$CH" <<'EOF'
import sys
docs, t1, t4 = float(sys.argv[1]), float(sys.argv[2]), float(sys.argv[3])
thr1 = docs / t1
thr4 = 4 * docs / t4   # 4 jobs of `docs` finished within the slowest child's time
eff = thr4 / (4 * thr1)
print(f'{{"metric":"multi_jvm_scaling_efficiency","value":{eff:.3f},'
      f'"docs_each":{int(docs)},"secs_1jvm":{t1:.2f},"secs_4jvm_slowest":{t4:.2f},'
      f'"docs_per_sec_1":{thr1:.1f},"docs_per_sec_4agg":{thr4:.1f}}}')
EOF

#!/usr/bin/env bash
# spark-submit launcher (north_rule: "launched via spark-submit --py-files
# on multi-executor clusters at N and 4N executors").
#
# Packages the engine as a zip and submits a job script against it. In
# the sandbox the master is local[N]; on a real cluster point MASTER at
# YARN/k8s and size executors with the usual flags — the engine code is
# identical either way: the launcher exports SPARK_GRAFT_MASTER, which
# session.get_spark follows instead of forcing local[N].
#
# Usage:
#   tools/submit.sh bench.py                    # default local[32]
#   MASTER=local[8] tools/submit.sh bench.py
#   MASTER=spark://host:7077 EXECUTORS=4 tools/submit.sh bench.py
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JOB="${1:-$REPO/bench.py}"
MASTER="${MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"

ZIP="$(mktemp -d)/paralleltrianglecounting_spark.zip"
(cd "$REPO" && python - "$ZIP" <<'EOF'
import sys, zipfile, pathlib
zf = zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path("paralleltrianglecounting_spark").rglob("*.py")):
    zf.write(p, p.as_posix())
zf.close()
print("packaged", sys.argv[1])
EOF
)

EXTRA=()
if [[ -n "${EXECUTORS:-}" ]]; then
  EXTRA+=(--num-executors "$EXECUTORS")
fi

# the engine's session factory honors this instead of forcing local[N]
export SPARK_GRAFT_MASTER="$MASTER"

# driver memory MUST come from the launcher: under spark-submit the JVM
# is already running when get_spark sets spark.driver.memory, so the
# conf is silently ignored and the Arrow stages hit netty's 1 GiB
# direct-memory default (OutOfDirectMemoryError at sf0.1 scale)
DRIVER_MEM="${DRIVER_MEM:-${SPARK_GRAFT_DRIVER_MEM:-16g}}"

exec spark-submit \
  --master "$MASTER" \
  --driver-memory "$DRIVER_MEM" \
  --py-files "$ZIP" \
  "${EXTRA[@]}" \
  "$JOB"

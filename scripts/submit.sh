#!/usr/bin/env bash
# Package the engine and launch the construction job via spark-submit
# --py-files (the north rule's cluster launch path). Extra args pass
# through to kg_submit_job.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
PKG_ZIP="${PKG_ZIP:-/tmp/kg_pkg.zip}"
MASTER="${SPARK_GRAFT_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"

cd "$REPO"
rm -f "$PKG_ZIP"
python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$PKG_ZIP', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('wikidata_sparql_history_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
"

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$PKG_ZIP" \
  scripts/kg_submit_job.py "$@"

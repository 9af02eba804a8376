#!/usr/bin/env bash
# Cluster deployment path (north rule): package the engine and run the
# replay via spark-submit --py-files. On a real cluster replace --master.
set -euo pipefail
cd "$(dirname "$0")/.."
python - <<'PY'
import zipfile, os
with zipfile.ZipFile('/tmp/engine.zip', 'w') as z:
    for root, _, files in os.walk('data_ingestor_py_spark'):
        for f in files:
            if f.endswith('.py'):
                z.write(os.path.join(root, f), os.path.join(root, f))
PY
cat > /tmp/replay_job.py <<'PY'
import sys
from data_ingestor_py_spark.cli import main
sys.exit(main(sys.argv[1:]))
PY
SUBMIT=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'bin', 'spark-submit'))")
exec "$SUBMIT" --master "local[${CORES:-8}]" --py-files /tmp/engine.zip /tmp/replay_job.py "$@"

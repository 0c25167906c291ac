"""spark-submit driver script (the only file shipped beside the zip).

    python tools/make_pyfiles.py
    spark-submit --master <cluster-master> \
        --py-files dist/sqllog_analysis_spark.zip \
        submit_main.py --input <transcripts.parquet> --output <dir>

The ``sqllog_analysis_spark`` package resolves from the --py-files zip:
spark-submit prepends it to the driver's sys.path in client mode and
distributes it to every executor's PYTHONPATH.  Under spark-submit the
session factory (session.py::get_spark) detects the launcher's JVM
gateway and leaves the master to --master instead of forcing local mode.

Tested end-to-end by tests/test_submit.py (local-mode spark-submit from a
directory OUTSIDE the repo, so the import provably comes from the zip).
"""

import sys

from sqllog_analysis_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

"""Zip the package and launch tools/build_job.py via spark-submit --py-files.

    python tools/submit_build.py --master local[8] -- \\
        --from-documents /root/testdata/sf0.001 --index-dir /tmp/idx \\
        --query "table merge window"

Everything after ``--`` goes to build_job.py. On a cluster, swap --master
(and add --num-executors etc.); the shipped artifact is identical.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solr_semantic_importer_spark.session import package_zip  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    master = "local[8]"
    if "--master" in argv:
        i = argv.index("--master")
        master = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    job_args = argv[argv.index("--") + 1 :] if "--" in argv else argv

    zip_path = package_zip()
    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    cmd = [
        spark_submit,
        "--master", master,
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--py-files", zip_path,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "build_job.py"),
        *job_args,
    ]
    print("+ " + " ".join(cmd), file=sys.stderr)
    return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())

"""Executor-side package distribution.

Python-executor code paths (the wire decode ``mapInPandas`` and the
base58 Pandas UDF) close over functions in this package; cloudpickle
serializes them by reference, so executor workers must be able to
``import huckli_spark``. When the driver process wasn't launched from
the repo root (e.g. the grading harness, a notebook, spark-submit from
elsewhere), that import fails. ``ensure_package_on_executors`` zips the
package and ships it via ``SparkContext.addPyFile`` — callable at
runtime on any session, including ones we didn't create.

On a real cluster this is the same mechanism you'd use to deploy the
engine without a wheel (``--py-files huckli_spark.zip``).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SENT: set[str] = set()


def ensure_package_on_executors(spark: SparkSession) -> None:
    import huckli_spark

    app_id = spark.sparkContext.applicationId
    if app_id in _SENT:
        return
    pkg_dir = os.path.dirname(os.path.abspath(huckli_spark.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"huckli_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    _SENT.add(app_id)

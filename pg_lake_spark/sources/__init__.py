"""Lake file readers/writers (SURVEY §2.1).

pg_lake's read surface — `read_parquet`/`read_csv` with dialect
sniffing/`read_json`/S3-log regex scans, globbing, the `filename`
column — and its COPY TO/FROM import-export path, re-expressed over
``spark.read`` / ``df.write``.
"""

from pg_lake_spark.sources.readers import read_lake, list_files, sniff_csv_dialect
from pg_lake_spark.sources.writers import copy_to

__all__ = ["read_lake", "list_files", "sniff_csv_dialect", "copy_to"]

"""Helper for dotted-path dynamic loading tests (the reference's
importlib processor mechanism, `streaming_pipeline.py:103-143`)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class AddTagProcessor:
    """Processor-style class: params become attributes, ``process`` is
    the transform (reference contract `base_processor.py:33-51`)."""

    def __init__(self, **params):
        for k, v in params.items():
            setattr(self, k, v)

    def process(self, df: DataFrame) -> DataFrame:
        return df.withColumn("tag", F.lit(getattr(self, "tag", "default")))

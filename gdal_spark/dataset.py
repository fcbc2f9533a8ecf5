"""Dataset abstraction: the GDALDataset surface over a table directory.

``GDALDataset`` is a container of layers with ExecuteSQL and per-layer
metadata (gcore/gdal_priv.h:506; layer count/metadata via GetLayer /
GetFeatureCount / GetExtent). The Spark restatement: a directory of
parquet tables is the dataset, each table a layer (DataFrame); `info()`
is the ogrinfo summary (feature count + extent); `execute_sql` routes
OGR SQL strings through gdal_spark.sqlapi with ST_ functions
registered.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Dataset:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._layers = {
            os.path.basename(p)[: -len(".parquet")]: p
            for p in sorted(glob.glob(os.path.join(root, "*.parquet")))
        }

    def layer_names(self) -> list[str]:
        return list(self._layers)

    def layer(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._layers[name])

    def layers(self) -> dict[str, DataFrame]:
        return {n: self.layer(n) for n in self._layers}

    def execute_sql(self, sql: str, **kw) -> DataFrame:
        from gdal_spark.sqlapi import execute_sql
        from gdal_spark.stfuncs import register_st_functions

        register_st_functions(self.spark)
        return execute_sql(self.spark, sql, self.layers(), **kw)

    def info(self) -> DataFrame:
        """ogrinfo-style summary: one row per layer with feature count
        and (for numeric lon/lat-bearing layers) the extent — the
        GetFeatureCount/GetExtent surface as one aggregation per layer."""
        frames = []
        for name in self._layers:
            df = self.layer(name)
            aggs = [F.count(F.lit(1)).alias("n_features")]
            cols = set(df.columns)
            if {"lon", "lat"} <= cols:
                aggs += [F.min("lon").cast("double").alias("min_x"),
                         F.max("lon").cast("double").alias("max_x"),
                         F.min("lat").cast("double").alias("min_y"),
                         F.max("lat").cast("double").alias("max_y")]
            else:
                aggs += [F.lit(None).cast("double").alias("min_x"),
                         F.lit(None).cast("double").alias("max_x"),
                         F.lit(None).cast("double").alias("min_y"),
                         F.lit(None).cast("double").alias("max_y")]
            frames.append(
                df.agg(*aggs).withColumn("layer", F.lit(name))
                .withColumn("n_fields", F.lit(len(df.columns)))
                .select("layer", "n_features", "n_fields",
                        "min_x", "max_x", "min_y", "max_y"))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

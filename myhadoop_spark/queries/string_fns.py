"""Extended string-function battery (complements scalar_fns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myhadoop_spark.catalog import load
from myhadoop_spark.registry import register


@register(
    "string_fns",
    oracle="""
    SELECT c_custkey,
           lpad(c_name, 25, '*') AS name_lpad,
           rpad(c_mktsegment, 12, '.') AS seg_rpad,
           translate(c_name, '#', '-') AS name_tr,
           reverse(c_mktsegment) AS seg_rev,
           repeat(substring(c_mktsegment, 1, 2), 3) AS seg_rep,
           CAST(strpos(c_name, '#') AS INT) AS hash_pos,
           split_part(c_name, '#', 1) AS name_head,
           regexp_replace(c_name, '[0-9]+', 'N') AS name_nonum,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
           left(c_mktsegment, 4) AS seg_left,
           right(c_mktsegment, 4) AS seg_right,
           CAST(starts_with(c_mktsegment, 'BU') AS BOOLEAN) AS is_bu,
           CAST(contains(c_name, '1') AS BOOLEAN) AS has_one
    FROM customer
    """,
    tags=("scalar", "string"),
)
def string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/rpad/translate/reverse/repeat/instr/split_part/regexp_* /
    left/right/startswith/contains — all codegen'd built-ins, one pass."""
    c = load(spark, sf_dir, "customer")
    name, seg = F.col("c_name"), F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.lpad(name, 25, "*").alias("name_lpad"),
        F.rpad(seg, 12, ".").alias("seg_rpad"),
        F.translate(name, "#", "-").alias("name_tr"),
        F.reverse(seg).alias("seg_rev"),
        F.repeat(F.substring(seg, 1, 2), 3).alias("seg_rep"),
        F.instr(name, "#").alias("hash_pos"),
        F.split_part(name, F.lit("#"), F.lit(1)).alias("name_head"),
        F.regexp_replace(name, "[0-9]+", "N").alias("name_nonum"),
        F.regexp_extract(name, "([0-9]+)", 1).alias("name_num"),
        F.substring(seg, 1, 4).alias("seg_left"),
        seg.substr(F.length(seg) - 3, F.lit(4)).alias("seg_right"),
        F.startswith(seg, F.lit("BU")).alias("is_bu"),
        F.contains(name, F.lit("1")).alias("has_one"),
    )

"""Entity linking: mention tokens vs a canonical-entity dictionary.

The dictionary is small (thousands-to-millions of surface forms) and is
broadcast; mentions are the 100 TB side and stream map-side through the
broadcast hash join — no shuffle of the big side. For head-entity skew
(one surface form matching an enormous number of mentions) we salt:
the dictionary is replicated K ways and each mention picks a salt from
xxhash64(mention) % K, splitting a hot key across K tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from extract_cbd_shape_spark.functions.text import tokens


def mentions_from_docs(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, mention) token mentions."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    tokens(F.col(text_col)).alias("_t"))
        .select("doc_id", F.explode("_t").alias("mention"))
        .distinct()
    )


def link_mentions(mentions: DataFrame, dictionary: DataFrame,
                  salt: int = 8) -> DataFrame:
    """(doc_id, mention, entity_id) via salted broadcast join.
    dictionary: (surface_form, entity_id)."""
    salted_dict = dictionary.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    m = mentions.withColumn(
        "_salt", F.pmod(F.xxhash64("mention"), F.lit(salt)).cast("int")
    )
    return (
        m.join(
            F.broadcast(salted_dict),
            (m.mention == salted_dict.surface_form)
            & (m._salt == salted_dict._salt),
        )
        .select("doc_id", "mention", "entity_id")
    )

"""URL canonicalization — shared by the batch dedup query (D28,
plans/queries_round11.py) and the streaming admission gate (I41,
streaming/pipelines.py). Pure codegen string algebra; no UDF.

Rules (the standard crawl-ingest normalization set):
- lowercase scheme and host
- strip an explicit https default port (:443)
- drop the #fragment
- drop utm_* tracking params, sort the remaining query params
- drop a trailing slash on the path
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url"]


def canonicalize_url(u: Column) -> dict[str, Column]:
    """-> {"canonical_url", "had_utm", "had_fragment", "had_port"}.

    Columns, not a struct: callers alias what they keep, and the
    expressions stay inlineable in whole-stage codegen.
    """
    no_frag = F.substring_index(u, "#", 1)
    scheme = F.lower(F.substring_index(no_frag, "://", 1))
    rest = F.substring_index(no_frag, "://", -1)
    before_q = F.substring_index(rest, "?", 1)
    query = F.when(
        F.instr(rest, "?") > 0, F.substring_index(rest, "?", -1)
    ).otherwise("")
    hostport = F.lower(F.substring_index(before_q, "/", 1))
    host = F.regexp_replace(hostport, ":443$", "")
    # path = everything from the first '/' of the host-relative part
    path = F.substring(before_q, F.instr(before_q, "/"), F.length(before_q))
    path = F.regexp_replace(path, "/$", "")
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (F.length(x) > 0) & ~x.startswith("utm_"),
    )
    canon_q = F.array_join(F.array_sort(kept), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(F.length(canon_q) > 0, F.concat(F.lit("?"), canon_q)).otherwise(""),
    )
    return {
        "canonical_url": canonical,
        "had_utm": F.array_contains(
            F.transform(F.split(query, "&"), lambda x: x.startswith("utm_")),
            True,
        ),
        "had_fragment": F.instr(u, "#") > 0,
        "had_port": hostport.endswith(":443"),
    }

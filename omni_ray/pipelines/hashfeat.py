"""Code-switch / blocking-key / feature-hashing operators (round 4,
batch 73):

- code_switch_census: intra-document language switching — the
  common-word lang-ID rule (mlqueries.lang_id's oracle-proven
  translation) applied separately to the FIRST and SECOND character
  halves of each doc; the (lang_left, lang_right) census exposes docs
  whose halves disagree (concatenated scrapes, template + content in
  different languages) that whole-doc lang-ID averages away. Bounded 2×2
  output, one pass.
- sorted_token_key_dups: sorted-neighborhood blocking — key = the sorted
  distinct [a-z]+ tokens of the first 80 chars (the classic
  record-linkage blocking key: word-order-insensitive, so shuffled
  boilerplate headers collide); the cluster-size census sizes the
  candidate-pair workload a pairwise matcher would face. Row-sized key →
  _bucketed_agg; bounded histogram out.
- feature_hash_collision_audit: the hashing-trick quality read — terms
  hashed into 4096 buckets (first-4-bytes-BE of md5 % 4096, the house
  audit keying); reports the terms-per-bucket histogram and the COLLIDED
  TF MASS (occurrences in buckets holding ≥2 distinct terms — exactly
  the signal a hashed feature space conflates). Term domain is row-sized
  (_bucketed_agg for tf), bucket domain bounded.

Scale shape: each op reads the fact table once and reduces to a bounded
census before the driver sees anything.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from .queries import _bucketed_agg, _pd_arrow, _read

_COMMON = ["the", "and", "of", "to", "a", "in", "is", "you", "that", "it"]
_KEY_CHARS = 80
_FH_BUCKETS = 4096


def _half_lang(texts: pd.Series, left: bool) -> pd.Series:
    import re

    common = set(_COMMON)
    rx = re.compile(r"[^a-z]+")

    def lab(t: str) -> str:
        t = t or ""
        half = t[: len(t) // 2] if left else t[len(t) // 2:]
        words = {w for w in rx.split(half.lower()) if len(w) >= 2}
        return "en" if len(words & common) > 5 else "unknown"

    return texts.map(lab)


def code_switch_census(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang_left": _half_lang(df["text"], True),
            "lang_right": _half_lang(df["text"], False),
        })

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["lang_left", "lang_right"])
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas().sort_values(["lang_left", "lang_right"])
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_CODE_SWITCH = r"""
WITH halves AS (
  SELECT substr(coalesce(text, ''), 1, length(coalesce(text, '')) // 2) AS l,
         substr(coalesce(text, ''), length(coalesce(text, '')) // 2 + 1) AS r
  FROM documents
), lab AS (
  SELECT CASE WHEN length(list_distinct(list_intersect(
              list_filter(string_split_regex(lower(l), '[^a-z]+'),
                          w -> length(w) >= 2),
              ['the','and','of','to','a','in','is','you','that','it']))) > 5
         THEN 'en' ELSE 'unknown' END AS lang_left,
         CASE WHEN length(list_distinct(list_intersect(
              list_filter(string_split_regex(lower(r), '[^a-z]+'),
                          w -> length(w) >= 2),
              ['the','and','of','to','a','in','is','you','that','it']))) > 5
         THEN 'en' ELSE 'unknown' END AS lang_right
  FROM halves
)
SELECT lang_left, lang_right, CAST(count(*) AS BIGINT) AS n_docs
FROM lab GROUP BY 1, 2
"""


def sorted_token_key_dups(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["text"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        head = df["text"].fillna("").str.slice(0, _KEY_CHARS).str.lower()
        toks = head.str.findall(r"[a-z]+")
        key = toks.map(lambda ks: " ".join(sorted(set(ks))))
        return pd.DataFrame({"key": key})

    clusters = _bucketed_agg(
        ds.map_batches(_pd_arrow(prep), batch_format="pandas"),
        ["key"], {"size": ("key", "count")}).to_pandas()
    hist = clusters["size"].value_counts().sort_index()
    out = pd.DataFrame({
        "cluster_size": hist.index.astype("int64"),
        "n_clusters": hist.to_numpy(np.int64),
    })
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_SORTED_TOKEN_KEY = f"""
WITH keys AS (
  SELECT array_to_string(list_sort(list_distinct(
           regexp_extract_all(lower(substr(coalesce(text, ''), 1,
                                           {_KEY_CHARS})), '[a-z]+'))),
         ' ') AS key
  FROM documents
), clusters AS (
  SELECT key, count(*) AS sz FROM keys GROUP BY 1
)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters
FROM clusters GROUP BY 1
"""


def feature_hash_collision_audit(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.lower().str.findall(r"[a-z]+")
        out = pd.DataFrame({"term": t}).explode("term").dropna()
        return out.groupby("term", sort=False).size() \
            .rename("tf").reset_index()

    tf = _bucketed_agg(
        ds.map_batches(_pd_arrow(toks), batch_format="pandas"),
        ["term"], {"tf": ("tf", "sum")}).to_pandas()
    md5 = hashlib.md5
    tf["bucket"] = [
        int.from_bytes(md5(t.encode()).digest()[:4], "big") % _FH_BUCKETS
        for t in tf["term"]]
    per = tf.groupby("bucket").agg(n_terms=("term", "size"),
                                   tf_mass=("tf", "sum"))
    hist = per["n_terms"].value_counts().sort_index()
    rows = [("terms_per_bucket", int(k), int(n)) for k, n in hist.items()]
    n_empty = _FH_BUCKETS - len(per)
    if n_empty > 0:
        rows.insert(0, ("terms_per_bucket", 0, n_empty))
    collided = int(per.loc[per["n_terms"] >= 2, "tf_mass"].sum())
    rows.append(("collided_tf_mass", 0, collided))
    out = pd.DataFrame(rows, columns=["metric", "k", "n"]) \
        .sort_values(["metric", "k"]).reset_index(drop=True)
    for c in ("k", "n"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


SQL_FEATURE_HASH = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+'))
           AS term
  FROM documents
), tf AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1
), b AS (
  SELECT CAST(CAST(('0x' || substr(md5(term), 1, 8)) AS UBIGINT)
              % {_FH_BUCKETS} AS BIGINT) AS bucket,
         term, tf
  FROM tf
), per AS (
  SELECT bucket, count(*) AS n_terms, sum(tf) AS tf_mass FROM b GROUP BY 1
), hist AS (
  SELECT n_terms AS k, CAST(count(*) AS BIGINT) AS n FROM per GROUP BY 1
  UNION ALL
  SELECT 0 AS k, {_FH_BUCKETS} - count(*) AS n FROM per
)
SELECT 'terms_per_bucket' AS metric, CAST(k AS BIGINT) AS k, n
FROM hist WHERE n > 0
UNION ALL
SELECT 'collided_tf_mass' AS metric, 0 AS k,
       CAST(coalesce(sum(CASE WHEN n_terms >= 2 THEN tf_mass END), 0)
            AS BIGINT) AS n
FROM per
"""


HASHFEAT_REGISTRY = {
    "code_switch_census": (code_switch_census, SQL_CODE_SWITCH),
    "sorted_token_key_dups": (sorted_token_key_dups, SQL_SORTED_TOKEN_KEY),
    "feature_hash_collision_audit": (feature_hash_collision_audit,
                                     SQL_FEATURE_HASH),
}

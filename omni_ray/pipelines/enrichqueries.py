"""Enrichment/validation-kernel operators (round 4, batch 81): the
M14/M16/M21 kernels — word-list sentiment, topic detection, and the
article validator — exercised as oracle-backed queries over synthesized
records with closed-form expectations (the htmlqueries/robotsops
discipline: the kernel is the unit under test).

- sentiment_wordlist_census: planted positive/negative word mixes rotating
  on doc_id; per (label) counts where label = sign of (pos − neg) distinct
  word counts — a missed word-list entry or a non-set-dedup bug flips
  counts.
- topic_classifier_census: planted topic keywords rotating across
  TOPIC_KEYWORDS domains (plus a no-topic rotation and a MULTI-topic one);
  per (n_topics, first_topic) counts pin both detection and the
  insertion-order truncation rule (detected[:3] follows dict order).
- validator_warning_census: synthesized articles rotating through
  validator outcomes — valid, short title (error), blocked domain (error),
  bad scheme (error), long-title warning; per (is_valid, n_errors,
  n_warnings) counts. Pins the rule thresholds (10/200 title chars) and
  the blocked-domain substring rule.

Scale shape: synthesis + kernel run fused map-side; bounded censuses out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count

from .queries import _pd_arrow, _read


def sentiment_wordlist_census(sf_dir: str):
    from ..functions.enrich import analyze_sentiment

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def text_for(i: int) -> str:
        r = i % 4
        if r == 0:   # 2 pos, 1 neg -> positive
            return "good great day with one bad moment good good"
        if r == 1:   # 1 pos, 2 neg -> negative
            return "terrible awful show saved by a good ending"
        if r == 2:   # 1 pos, 1 neg -> exactly neutral score 0
            return "good bad mixed feelings"
        return "plain words without any charged vocabulary"

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        labels = []
        for i in df["doc_id"].to_numpy(np.int64):
            s = analyze_sentiment(text_for(int(i)))
            labels.append("pos" if s["overall"] > 0
                          else "neg" if s["overall"] < 0 else "neutral")
        return pd.DataFrame({"label": labels})

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby("label").aggregate(Count(alias_name="n_docs"))
        .to_pandas().sort_values("label").reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# rotations 2 and 3 both score neutral (tie / no charged words)
SQL_SENTIMENT_CENSUS = """
SELECT CASE doc_id % 4 WHEN 0 THEN 'pos' WHEN 1 THEN 'neg'
       ELSE 'neutral' END AS label,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
"""


def topic_classifier_census(sf_dir: str):
    from ..functions.enrich import extract_topics

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def text_for(i: int) -> str:
        r = i % 4
        if r == 0:
            return "new software release for the computer"
        if r == 1:
            return "the election and the senate policy debate"
        if r == 2:   # multi: technology + business + health
            return "ai market medicine roundup"
        return "a quiet story about gardens and rivers"

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        n, first = [], []
        for i in df["doc_id"].to_numpy(np.int64):
            topics = extract_topics("", text_for(int(i)))
            n.append(len(topics))
            first.append(topics[0] if topics else "none")
        return pd.DataFrame({"n_topics": pd.Series(n, dtype="int64"),
                             "first_topic": first})

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["n_topics", "first_topic"])
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas().sort_values(["n_topics", "first_topic"])
        .reset_index(drop=True)
    )
    for c in ("n_topics", "n_docs"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# rotation 2 hits technology('ai') + business('market') + health('medicine');
# TOPIC_KEYWORDS dict order puts technology first
SQL_TOPIC_CENSUS = """
SELECT CAST(CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 3
            ELSE 0 END AS BIGINT) AS n_topics,
       CASE doc_id % 4 WHEN 0 THEN 'technology' WHEN 1 THEN 'politics'
            WHEN 2 THEN 'technology' ELSE 'none' END AS first_topic,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1, 2
"""


def validator_warning_census(sf_dir: str):
    import datetime

    from ..functions.validate import validate_article

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    as_of = datetime.datetime(2024, 6, 1)
    content = ("This article body is a perfectly reasonable sentence. "
               "It continues with another sentence of sane length. " * 4)

    def case_for(i: int):
        r = i % 5
        if r == 0:   # fully valid
            return ("A perfectly sized title", "https://ok.test/a", "ok.test")
        if r == 1:   # title too short -> error
            return ("tiny", "https://ok.test/b", "ok.test")
        if r == 2:   # blocked domain -> error
            return ("A perfectly sized title", "https://spam.example.com/x",
                    "spam.example.com")
        if r == 3:   # bad scheme -> error
            return ("A perfectly sized title", "ftp://ok.test/c", "ok.test")
        # very long title -> warning only
        return ("T" * 250, "https://ok.test/d", "ok.test")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for i in df["doc_id"].to_numpy(np.int64):
            title, url, domain = case_for(int(i))
            res = validate_article(title, url, domain, content, ["Ann"],
                                   None, as_of,
                                   blocked_domains=["spam.example.com"])
            rows.append((1 if res["is_valid"] else 0,
                         len(res["errors"]), len(res["warnings"])))
        return pd.DataFrame(rows, columns=["is_valid", "n_errors",
                                           "n_warnings"]).astype("int64")

    out = (
        ds.map_batches(_pd_arrow(prep), batch_format="pandas")
        .groupby(["is_valid", "n_errors", "n_warnings"])
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas().sort_values(["is_valid", "n_errors", "n_warnings"])
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False) \
        .replace_schema_metadata(None)


# Hand-derived from article_validator rules (an INDEPENDENT reading of the
# kernel, not a replay):
#  r0 valid title/url/content/author         -> (1, 0, 0)
#  r1 4-char title: 'Title too short' is an ERROR that does NOT flip
#     is_valid (the reference's quirk, validate.py:115-118)  -> (1, 1, 0)
#  r2 blocked domain: error + is_valid=False -> (0, 1, 0)
#  r3 ftp scheme:     error + is_valid=False -> (0, 1, 0)
#  r4 250-char title: warning only           -> (1, 0, 1)
# (content 416 chars passes; authors ['Ann'] pass; publish_date None is
# skipped entirely - no date warning.)
SQL_VALIDATOR_CENSUS = """
WITH lut(r, is_valid, n_errors, n_warnings) AS (
  VALUES (0, 1, 0, 0), (1, 1, 1, 0), (2, 0, 1, 0), (3, 0, 1, 0),
         (4, 1, 0, 1)
)
SELECT CAST(l.is_valid AS BIGINT) AS is_valid,
       CAST(l.n_errors AS BIGINT) AS n_errors,
       CAST(l.n_warnings AS BIGINT) AS n_warnings,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN lut l ON d.doc_id % 5 = l.r
GROUP BY 1, 2, 3
"""


ENRICHQUERIES_REGISTRY = {
    "sentiment_wordlist_census": (sentiment_wordlist_census,
                                  SQL_SENTIMENT_CENSUS),
    "topic_classifier_census": (topic_classifier_census, SQL_TOPIC_CENSUS),
    "validator_warning_census": (validator_warning_census,
                                 SQL_VALIDATOR_CENSUS),
}

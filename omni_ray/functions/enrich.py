"""Enrichment operators M10–M20 (SURVEY.md §2.2) + quality/category scoring
(M16/M18 from content_enhancement.py) as one fused, stateful map_batches stage.

Semantics per the reference (file:line cites against /root/reference/):
  * excerpt/summary   — first-200-chars word-truncated + first-3-sentences
                        (content_enricher.py:78-96, :300-303). DIVERGENCE:
                        nltk.sent_tokenize is unavailable; we use a
                        deterministic regex sentence splitter.
  * entities          — people (capitalized bigram heuristic, conf 0.6/0.3),
                        orgs (suffix regexes, 0.7), locations (preposition +
                        Capitalized, 0.5), top-10 each (content_enricher.py:98-162)
  * keywords          — ≥3-alpha-char tokens, stopword filter, top-15 by
                        frequency (content_enricher.py:164-178)
  * language          — overlap with 10 common English words, >5 ⇒ 'en'
                        (content_enricher.py:180-193)
  * read_time         — max(1, round(words/200)) (content_enricher.py:195-203)
  * sentiment         — word-list pos/neg sets → (pos−neg)/(pos+neg) + counts
                        (content_enricher.py:205-229)
  * topics            — 5 topic dictionaries, ≤3 (content_enricher.py:231-252)
  * content_hash      — sha256(title+content+url) (content_enricher.py:254-259)
  * confidence_score  — mean of 3 banded factors, round 2dp
                        (content_enricher.py:261-298)
  * quality_score     — banded 0-100 (content_enhancement.py:155-200)
  * category          — 6 keyword dictionaries, first match wins, else
                        'general' (content_enhancement.py:202-219)

Stopwords: the standard NLTK English list (public corpus, 179 words) embedded
verbatim so no corpus download is needed. The ``Enricher`` class is the
actor-pool form (``map_batches(Enricher, concurrency=N)``): regexes and sets
are built once per actor in ``__init__`` (ST2 semantics).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pyarrow as pa

# The NLTK English stopword list (public domain corpus), frozen.
STOPWORDS = frozenset(
    """i me my myself we our ours ourselves you you're you've you'll you'd your
    yours yourself yourselves he him his himself she she's her hers herself it
    it's its itself they them their theirs themselves what which who whom this
    that that'll these those am is are was were be been being have has had
    having do does did doing a an the and but if or because as until while of
    at by for with about against between into through during before after
    above below to from up down in out on off over under again further then
    once here there when where why how all any both each few more most other
    some such no nor not only own same so than too very s t can will just don
    don't should should've now d ll m o re ve y ain aren aren't couldn
    couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven haven't
    isn isn't ma mightn mightn't mustn mustn't needn needn't shan shan't
    shouldn shouldn't wasn wasn't weren weren't won won't wouldn wouldn't""".split()
)

POSITIVE_WORDS = frozenset(
    {"good", "great", "excellent", "amazing", "wonderful", "best", "fantastic"}
)
NEGATIVE_WORDS = frozenset(
    {"bad", "terrible", "awful", "horrible", "worst", "negative", "poor"}
)
ENGLISH_COMMON = frozenset(
    {"the", "and", "of", "to", "a", "in", "is", "you", "that", "it"}
)

TOPIC_KEYWORDS = {
    "technology": ["ai", "artificial intelligence", "software", "tech", "digital", "computer"],
    "politics": ["government", "election", "policy", "political", "senate", "congress"],
    "business": ["market", "economy", "company", "business", "financial", "stock"],
    "sports": ["game", "team", "player", "sport", "championship", "score"],
    "health": ["medical", "health", "disease", "hospital", "medicine", "treatment"],
}

CATEGORY_KEYWORDS = {
    "politics": ["election", "government", "president", "minister", "congress", "senate", "vote"],
    "sports": ["game", "team", "player", "score", "championship", "tournament", "olympics"],
    "technology": ["tech", "software", "computer", "digital", "ai", "artificial intelligence", "robot"],
    "business": ["market", "stock", "economy", "business", "company", "profit", "investment"],
    "health": ["health", "medical", "doctor", "hospital", "disease", "medicine", "vaccine"],
    "entertainment": ["movie", "film", "celebrity", "music", "show", "entertainment", "actor"],
}

_ORG_PATTERNS = [
    re.compile(r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\s+(Inc|Corp|Corporation|Company|Co|LLC|Ltd)\b", re.IGNORECASE),
    re.compile(r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\s+(International|Global|Technologies|Systems)\b", re.IGNORECASE),
]
_LOC_PATTERN = re.compile(r"\b(in|at|from|to)\s+([A-Z][a-zA-Z]+(?:\s+[A-Z][a-zA-Z]+)*)\b", re.IGNORECASE)
_ALPHA3_RE = re.compile(r"\b[a-zA-Z]{3,}\b")
_ALPHA2_RE = re.compile(r"\b[a-z]{2,}\b")
_WORD_RE = re.compile(r"\b\w+\b")
# deterministic sentence splitter (punkt replacement): split after . ! ?
# followed by whitespace + an uppercase/quote/digit opener
_SENT_RE = re.compile(r"(?<=[.!?])\s+(?=[A-Z\"'0-9])")


def sent_tokenize(text: str) -> list[str]:
    text = text.strip()
    if not text:
        return []
    return [s for s in _SENT_RE.split(text) if s]


def truncate_text(text: str, max_length: int) -> str:
    """content_enricher.py:300-303."""
    if len(text) <= max_length:
        return text
    return text[:max_length].rsplit(" ", 1)[0] + "..."


def generate_summary(content: str) -> tuple[str, str]:
    excerpt = truncate_text(content, 200)
    sentences = sent_tokenize(content)
    if len(sentences) >= 3:
        summary = " ".join(sentences[:3])
    else:
        summary = content[:500]
    return excerpt, summary.strip()


def extract_people(text: str) -> list[dict]:
    people = []
    words = text.split()
    for i, word in enumerate(words):
        if (
            word.istitle()
            and len(word) > 1
            and word.lower() not in STOPWORDS
            and (i == 0 or (words[i - 1] and words[i - 1][-1] not in [".", "!", "?"]))
        ):
            if i + 1 < len(words) and words[i + 1].istitle() and len(words[i + 1]) > 1:
                people.append({"name": f"{word} {words[i + 1]}", "confidence": 0.6})
            else:
                people.append({"name": word, "confidence": 0.3})
        if len(people) >= 10:
            break
    return people[:10]


_ORG_SUFFIXES_1 = frozenset(
    s.lower() for s in ["Inc", "Corp", "Corporation", "Company", "Co", "LLC", "Ltd"]
)
_ORG_SUFFIXES_2 = frozenset(
    s.lower() for s in ["International", "Global", "Technologies", "Systems"]
)
_ORG_SUFFIX_HINT = re.compile(
    r"\b(inc|corp|corporation|company|co|llc|ltd|international|global|technologies|systems)\b",
    re.IGNORECASE,
)
_ALPHA_RUN_RE = re.compile(r"[A-Za-z]+")


def _alpha_words(text: str) -> tuple[list[int], list[int], list[str]]:
    """Maximal alpha runs of length ≥2 as parallel (starts, ends, lowered)
    lists — computed ONCE per text and shared by both suffix-set scans
    (match objects and their .start()/.end() calls dominated the old
    profile: ~1.2M attr calls per 400 docs)."""
    starts: list[int] = []
    ends: list[int] = []
    lows: list[str] = []
    for m in _ALPHA_RUN_RE.finditer(text):
        s, e = m.span()
        if e - s >= 2:
            starts.append(s)
            ends.append(e)
            lows.append(text[s:e].lower())
    return starts, ends, lows


def _org_matches_linear(
    text: str, suffixes: frozenset, words=None
) -> list[str]:
    """Linear-time equivalent of the reference org regex
    ``\\b([A-Z][a-z]+(?:\\s+[A-Z][a-z]+)*)\\s+(SUFFIX)\\b`` with IGNORECASE
    (content_enricher.py:139-142). Nodes are maximal alpha runs of length ≥2
    (the only spans ``[A-Z][a-z]+`` can fully consume between ``\\b``/``\\s``);
    chain edges require the inter-word gap to be non-empty pure whitespace;
    the greedy match starts at the chain's first word and ends at the LAST
    suffix word in the chain — after which no suffix remains, so each chain
    emits at most ONE match. Equivalence is pinned by a hypothesis test
    against the actual regexes. Avoids the regex engine's quadratic retry
    scan over long all-caps-free prose."""
    starts, ends, lows = words if words is not None else _alpha_words(text)
    out = []
    n = len(starts)
    i = 0
    while i < n:
        # build the chain [i..k]: consecutive words joined by pure whitespace
        k = i
        while (
            k + 1 < n
            and starts[k + 1] > ends[k]
            and text[ends[k] : starts[k + 1]].isspace()
        ):
            k += 1
        # the single greedy match: last suffix strictly after the chain head
        last_suffix = -1
        for j in range(i + 1, k + 1):
            if lows[j] in suffixes:
                last_suffix = j
        if last_suffix > i:
            out.append(text[starts[i] : ends[last_suffix]])
        i = k + 1
    return out


def extract_organizations(text: str) -> list[dict]:
    # cheap necessary-condition scan first; then the linear-time chain scan
    # (equivalent to the reference's backtracking regexes — see tests)
    if not _ORG_SUFFIX_HINT.search(text):
        return []
    words = _alpha_words(text)
    orgs = []
    for suffixes in (_ORG_SUFFIXES_1, _ORG_SUFFIXES_2):
        for name in _org_matches_linear(text, suffixes, words=words):
            orgs.append({"name": name, "confidence": 0.7})
            if len(orgs) >= 10:
                return orgs
    return orgs[:10]


def extract_locations(text: str) -> list[dict]:
    locs = []
    for m in _LOC_PATTERN.finditer(text):
        locs.append({"name": m.group(2), "confidence": 0.5})
        if len(locs) >= 10:
            break
    return locs[:10]


def extract_keywords(text_lower_source: str, max_keywords: int = 15) -> list[str]:
    words = _ALPHA3_RE.findall(text_lower_source.lower())
    filtered = [w for w in words if w not in STOPWORDS]
    return [w for w, _ in Counter(filtered).most_common(max_keywords)]


def detect_language(content: str) -> str:
    words = set(_ALPHA2_RE.findall(content.lower()))
    return "en" if len(words & ENGLISH_COMMON) > 5 else "unknown"


def calculate_read_time(content: str) -> int:
    wc = len(_WORD_RE.findall(content))
    return max(1, round(wc / 200))


def analyze_sentiment(content: str) -> dict:
    words = set(_WORD_RE.findall(content.lower()))
    pos = len(words & POSITIVE_WORDS)
    neg = len(words & NEGATIVE_WORDS)
    total = pos + neg
    score = (pos - neg) / total if total > 0 else 0.0
    return {"overall": score, "positive": pos, "negative": neg, "neutral": len(words) - total}


def extract_topics(title: str, content: str) -> list[str]:
    full_text = f"{title.lower()} {content.lower()}"
    detected = [t for t, kws in TOPIC_KEYWORDS.items() if any(k in full_text for k in kws)]
    return detected[:3]


def categorize(title: str, content: str) -> str:
    full = (title + " " + content).lower()
    for cat, kws in CATEGORY_KEYWORDS.items():
        if any(k in full for k in kws):
            return cat
    return "general"


def confidence_score(content_len: int, total_entities: int, n_keywords: int) -> float:
    factors = []
    if content_len > 1000:
        factors.append(0.9)
    elif content_len > 500:
        factors.append(0.7)
    elif content_len > 100:
        factors.append(0.5)
    else:
        factors.append(0.3)
    if total_entities > 5:
        factors.append(0.8)
    elif total_entities > 2:
        factors.append(0.6)
    else:
        factors.append(0.4)
    if n_keywords >= 5:
        factors.append(0.7)
    elif n_keywords >= 2:
        factors.append(0.5)
    else:
        factors.append(0.3)
    return round(sum(factors) / len(factors), 2)


def quality_score(content_len: int, title: str, total_entities: int,
                  has_authors: bool, has_images: bool) -> int:
    """content_enhancement.py:155-200: banded 0-100."""
    score = 0
    if content_len > 2000:
        score += 30
    elif content_len > 1000:
        score += 25
    elif content_len > 500:
        score += 20
    elif content_len > 200:
        score += 10
    if title and title != "No Title":
        if len(title) > 20:
            score += 20
        elif len(title) > 10:
            score += 15
    if total_entities > 10:
        score += 30
    elif total_entities > 5:
        score += 20
    elif total_entities > 2:
        score += 10
    if has_authors:
        score += 10
    if has_images:
        score += 10
    return min(score, 100)


def extract_key_phrases(text: str, max_phrases: int = 15) -> list[str]:
    """ST1 key-phrase analogue (content_enhancement.py:132-153): the
    reference uses spaCy noun chunks over the first 5,000 chars, keeps
    10..50-char phrases, ``list(set(...))[:15]``. spaCy is unavailable; the
    deterministic replacement takes maximal runs of ≥2 consecutive
    non-stopword words as phrases, same length gates, sorted before
    truncation (nondeterministic set order divergence documented,
    SURVEY.md §7.5(4))."""
    text = text[:5000]
    words = _WORD_RE.findall(text)
    phrases = set()
    run: list[str] = []
    for w in words + [""]:
        if w and w.lower() not in STOPWORDS and not w.isdigit():
            run.append(w)
        else:
            if len(run) >= 2:
                phrase = " ".join(run)
                if 10 < len(phrase) < 50:
                    phrases.add(phrase)
            run = []
    return sorted(phrases)[:max_phrases]


def sentiment_label(content: str) -> dict:
    """M15 (content_enhancement.py:99-130): polarity/subjectivity + 3-way
    label at ±0.1. TextBlob is unavailable here; the deterministic fallback
    derives polarity from the word-list counts ((pos−neg)/(pos+neg)) and
    subjectivity from the sentiment-word density — gated behind an import-try
    so a real TextBlob slots in unchanged where installed."""
    try:  # pragma: no cover - TextBlob absent in this environment
        from textblob import TextBlob  # type: ignore

        blob = TextBlob(content)
        polarity = blob.sentiment.polarity
        subjectivity = blob.sentiment.subjectivity
    except ImportError:
        words = _WORD_RE.findall(content.lower())
        wordset = set(words)
        pos = len(wordset & POSITIVE_WORDS)
        neg = len(wordset & NEGATIVE_WORDS)
        total = pos + neg
        polarity = (pos - neg) / total if total else 0.0
        subjectivity = min(1.0, (sum(1 for w in words if w in POSITIVE_WORDS or w in NEGATIVE_WORDS) / len(words)) * 10) if words else 0.0
    if polarity > 0.1:
        label = "positive"
    elif polarity < -0.1:
        label = "negative"
    else:
        label = "neutral"
    return {
        "sentiment_polarity": polarity,
        "sentiment_subjectivity": subjectivity,
        "sentiment_label": label,
    }


ENTITY_TYPE = pa.list_(pa.struct([("name", pa.string()), ("confidence", pa.float64())]))
SENTIMENT_TYPE = pa.struct(
    [("overall", pa.float64()), ("positive", pa.int64()),
     ("negative", pa.int64()), ("neutral", pa.int64())]
)


def _regex_ner(texts: list) -> list:
    """Default NER backend: the deterministic regex extractors (parity-tested
    against the reference's stored spaCy outputs)."""
    return [
        {
            "people": extract_people(t),
            "organizations": extract_organizations(t),
            "locations": extract_locations(t),
        }
        for t in texts
    ]


def _spacy_ner_factory():
    """Real-model seam (ST1; reference content_enhancement.py:19-27 loads
    spaCy en_core_web_sm). The model loads HERE, once per actor — spaCy is
    absent from this environment, so this raises with a clear message; the
    plumbing (batched signature, per-actor load) is the real scale shape."""
    try:
        import spacy  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "spaCy is not installed in this environment; pass ner_model="
            "'regex' (default, parity-tested) or a callable factory returning "
            "fn(texts)->[{people,organizations,locations}]"
        ) from e
    nlp = spacy.load("en_core_web_sm")

    def run(texts: list) -> list:
        out = []
        for doc in nlp.pipe(texts):
            ents = {"people": [], "organizations": [], "locations": []}
            kinds = {"PERSON": "people", "ORG": "organizations",
                     "GPE": "locations", "LOC": "locations"}
            for e in doc.ents:
                k = kinds.get(e.label_)
                if k:
                    # ENTITY_TYPE shape: (name, confidence)
                    ents[k].append({"name": e.text, "confidence": 0.85})
            out.append(ents)
        return out

    return run


class Enricher:
    """Actor-pool enrichment stage (ST2 analogue): all derived columns in one
    pass. Input columns: title, <content_col>, url, authors, images.

    ``ner_model`` selects the entity-extraction backend, resolved ONCE per
    actor here in ``__init__`` (the model-load seam, ST1):
      * "regex" (default) — deterministic extractors, bit-for-bit parity
        with the shipped corpus;
      * "spacy" — loads en_core_web_sm per actor (unavailable in this
        sandbox; raises with guidance);
      * a callable FACTORY — called once per actor, must return
        ``fn(texts: list[str]) -> list[{people, organizations, locations}]``
        (batched, so a GPU/ONNX model amortizes per-batch).
    """

    def __init__(self, content_col: str = "extracted_text", ner_model="regex"):
        self.content_col = content_col
        if ner_model == "regex":
            self._ner = _regex_ner
        elif ner_model == "spacy":
            self._ner = _spacy_ner_factory()
        elif callable(ner_model):
            self._ner = ner_model()
        else:
            raise ValueError(f"unknown ner_model: {ner_model!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        titles = [t or "" for t in batch.column("title").to_pylist()]
        contents = [c or "" for c in batch.column(self.content_col).to_pylist()]
        urls = [u or "" for u in batch.column("url").to_pylist()]
        authors = (
            batch.column("authors").to_pylist()
            if "authors" in batch.column_names
            else [[] for _ in urls]
        )
        images = (
            batch.column("images").to_pylist()
            if "images" in batch.column_names
            else [[] for _ in urls]
        )

        # batched NER through the pluggable backend (one call per batch —
        # a real model amortizes here; the regex default is per-text anyway)
        ner_out = self._ner([f"{t} {c}" for t, c in zip(titles, contents)])

        excerpts, summaries, people_l, orgs_l, locs_l = [], [], [], [], []
        keywords_l, langs, read_times, sentiments, topics_l = [], [], [], [], []
        hashes, confs, quals, cats = [], [], [], []
        for title, content, url, auth, imgs, ents in zip(
            titles, contents, urls, authors, images, ner_out
        ):
            excerpt, summary = generate_summary(content)
            tc = f"{title} {content}"
            people = ents["people"]
            orgs = ents["organizations"]
            locs = ents["locations"]
            kws = extract_keywords(tc)
            total_entities = len(people) + len(orgs) + len(locs)
            excerpts.append(excerpt)
            summaries.append(summary)
            people_l.append(people)
            orgs_l.append(orgs)
            locs_l.append(locs)
            keywords_l.append(kws)
            langs.append(detect_language(content))
            read_times.append(calculate_read_time(content))
            sentiments.append(analyze_sentiment(content))
            topics_l.append(extract_topics(title, content))
            hashes.append(
                hashlib.sha256(f"{title}{content}{url}".encode("utf-8")).hexdigest()
            )
            confs.append(confidence_score(len(content), total_entities, len(kws)))
            quals.append(
                quality_score(len(content), title, total_entities, bool(auth), bool(imgs))
            )
            cats.append(categorize(title, content))

        cols = {
            "excerpt": pa.array(excerpts, pa.string()),
            "summary": pa.array(summaries, pa.string()),
            "entities_people": pa.array(people_l, ENTITY_TYPE),
            "entities_organizations": pa.array(orgs_l, ENTITY_TYPE),
            "entities_locations": pa.array(locs_l, ENTITY_TYPE),
            "keywords": pa.array(keywords_l, pa.list_(pa.string())),
            "language": pa.array(langs, pa.string()),
            "read_time": pa.array(read_times, pa.int64()),
            "sentiment": pa.array(sentiments, SENTIMENT_TYPE),
            "topics": pa.array(topics_l, pa.list_(pa.string())),
            "content_hash": pa.array(hashes, pa.string()),
            "confidence_score": pa.array(confs, pa.float64()),
            "quality_score": pa.array(quals, pa.int64()),
            "category": pa.array(cats, pa.string()),
        }
        for name, arr in cols.items():
            batch = batch.append_column(name, arr)
        return batch


def enrich_batch(batch: pa.Table) -> pa.Table:
    """Stateless-function form of the enricher (for small pipelines/tests)."""
    return Enricher()(batch)

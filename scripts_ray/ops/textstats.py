"""Text-analysis operators over a documents-style table (SURVEY §2.2/§2.5).

All hot paths are vectorized Arrow/pandas kernels inside `map_batches`;
aggregations use the partial-then-final pattern (per-batch combine before
the groupby shuffle).

Reference semantics: word-frequency dict (/root/reference/src/mk-wf-dict.py:17-42),
KWIC search (/root/reference/src/KWIC-iter-search.py:27-109), doc stats
(/root/reference/src/stats-dashboard/generate-markdown.py:103-156).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..gate import detect_lang
from ..rules import RE_TOKEN_SEP, RE_WHITESPACE, normalize_whitespace
from ..tokens import token_signals

RE_WORD = r"[a-zà-öø-ÿ]+"
RE_NONWS = r"[^ \t\r\n\f\v]+"


def md5_hex(values) -> list[str]:
    return [hashlib.md5(v.encode("utf-8")).hexdigest() for v in values]


def word_freq(docs_ds, top_k: int = 100):
    """Global word frequency, top-k by (count desc, token asc).
    Partial counts per batch → two-level hash aggregate (vocabulary
    cardinality scales with the corpus) → sort+limit."""
    from .hashagg import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        from ..tokens import explode

        _, toks = explode(batch["text"].combine_chunks())
        vals, cnts = np.unique(toks, return_counts=True)
        return pa.table(
            {"token": pa.array(vals, type=pa.string()),
             "cnt": pa.array(cnts, type=pa.int64())}
        )

    agg = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        keys="token",
        aggs={"cnt": ("cnt", "sum")},
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(top_k)


def kwic(docs_ds, pattern: str):
    """Keyword-in-context: all non-overlapping matches with ±30-char windows,
    emitted as variable-count rows (flat-map shape)."""
    rx = re.compile(pattern)

    def find(batch: pd.DataFrame) -> pd.DataFrame:
        hits = batch["text"].str.findall(rx)
        out = batch[["doc_id"]].assign(context=hits).explode("context")
        return out.dropna(subset=["context"]).reset_index(drop=True)

    return docs_ds.map_batches(find, batch_format="pandas")


def kwic_bank(docs_ds, bank):
    """Config-driven KWIC (M13 + §2.9): run every named pattern of the
    bank in ONE pass over the corpus, emitting (doc_id, pattern_name,
    context). The loop is over the constant-size pattern bank, not rows;
    each pattern's scan is the vectorized str.findall kernel. Patterns
    compile once per task closure."""
    bank = [(name, re.compile(p)) for name, p in bank]

    def find(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for name, rx in bank:
            hits = batch["text"].str.findall(rx)
            out = batch[["doc_id"]].assign(pattern_name=name, context=hits)
            outs.append(
                out.explode("context").dropna(subset=["context"])
            )
        return pd.concat(outs, ignore_index=True)

    return docs_ds.map_batches(find, batch_format="pandas")


def doc_stats(docs_ds):
    def stats(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        norm = normalize_whitespace(text)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(text, pattern=RE_NONWS), pa.int64()
                ),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(pc.utf8_lower(text), pattern=RE_WORD),
                    pa.int64(),
                ),
                "fingerprint": pa.array(md5_hex(norm.to_pylist()), type=pa.string()),
            }
        )

    return docs_ds.map_batches(stats, batch_format="pyarrow")


def lang_docs(docs_ds):
    def langs(batch: pa.Table) -> pa.Table:
        sig = token_signals(batch["text"].combine_chunks())
        lang = detect_lang(sig["n_sv"], sig["n_en"])
        return pa.table(
            {"doc_id": batch["doc_id"], "lang": pa.array(lang, type=pa.string())}
        )

    return docs_ds.map_batches(langs, batch_format="pyarrow")


def quality_docs(docs_ds):
    def quality(batch: pa.Table) -> pa.Table:
        sig = token_signals(batch["text"].combine_chunks())
        nt, nd = sig["n_tokens"], sig["n_distinct"]
        with np.errstate(divide="ignore", invalid="ignore"):
            pct = np.floor(100.0 * nd / nt)
        diversity = pa.array(
            [None if nt[i] == 0 else int(pct[i]) for i in range(len(nt))],
            type=pa.int64(),
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(nt, type=pa.int64()),
                "n_distinct": pa.array(nd, type=pa.int64()),
                "n_stop": pa.array(sig["n_en"], type=pa.int64()),
                "diversity_pct": diversity,
            }
        )

    return docs_ds.map_batches(quality, batch_format="pyarrow")


# BPE-style pretokenizer (GPT-2-shaped): a letter run, a digit run, or a
# punctuation run, each with an optional leading space — the standard
# approximation for LLM token budgeting without a vocab file. RE2-safe on
# both engines (explicit whitespace class, no lookarounds).
RE_BPE = r" ?[a-zA-ZÀ-ÿ]+| ?[0-9]+| ?[^a-zA-ZÀ-ÿ0-9 \t\r\n\f\v]+"


def token_counts(docs_ds):
    """Token counting for training-data budgeting: whitespace tokens and
    BPE-ish pretokenizer tokens per document (brief: 'token counting
    (whitespace + a BPE-ish regex)')."""

    def count(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(text, pattern=RE_NONWS), pa.int64()
                ),
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(text, pattern=RE_BPE), pa.int64()
                ),
            }
        )

    return docs_ds.map_batches(count, batch_format="pyarrow")


VALIDATE_MIN_CHARS = 50


def validate_docs(docs_ds):
    """M19 validate/reject: line-shape rules over every document with an
    explicit reject-list output (reference: BibTeX fragment validator
    emitting (ok, errors) per file,
    /root/reference/src/references/compile-bib-references.py:26-68).
    Rules: too_short (< VALIDATE_MIN_CHARS chars), unterminated (last char
    not sentence-final). Emits ALL rows with (valid, reject_reason) so the
    reject list is `WHERE NOT valid`."""

    def check(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        too_short = pc.less(pc.utf8_length(text), VALIDATE_MIN_CHARS).to_numpy(
            zero_copy_only=False
        )
        lastc = pd.Series(text.to_pandas()).str[-1:].fillna("")
        unterm = ~lastc.isin([".", "!", "?"]).to_numpy()
        reason = np.select(
            [too_short, unterm], ["too_short", "unterminated"], default=None
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "valid": pa.array([r is None for r in reason], type=pa.bool_()),
                "reject_reason": pa.array(reason, type=pa.string()),
            }
        )

    return docs_ds.map_batches(check, batch_format="pyarrow")


def binary_meta(docs_ds, chunk_bytes: int = 256):
    """Multimodal plumbing: treat the payload as opaque bytes with typed
    metadata (byte size, chunk count). The decode step itself is stubbed in
    ops.multimodal — this is the schema/metadata path."""

    def meta(batch: pa.Table) -> pa.Table:
        data = batch["text"].combine_chunks()
        nb = pc.cast(pc.binary_length(pc.cast(data, pa.binary())), pa.int64())
        chunks = pc.cast(
            pc.ceil(pc.divide(pc.cast(nb, pa.float64()), float(chunk_bytes))),
            pa.int64(),
        )
        return pa.table(
            {"doc_id": batch["doc_id"], "n_bytes": nb, "n_chunks": chunks}
        )

    return docs_ds.map_batches(meta, batch_format="pyarrow")


# ---- Within-doc repetition signals (Gopher-style quality heuristics) -------

REP_SHINGLE_MAX_PERMILLE = 20  # drop if >= this fraction duplicate shingles
TOP_TOKEN_MAX_PERMILLE = 150  # drop if the modal token covers >= this share


def doc_repetition(docs_ds):
    """Within-document repetition quality signals in the Gopher /
    MassiveText style: the fraction of 3-token shingle positions that
    repeat an earlier shingle of the SAME document (phrase repetition) and
    the share of token positions taken by the single most frequent token
    (token skew). Both are integer permille over the SQL-reproducible
    winnow shingle chain, so the oracle recomputes them exactly.
    Embarrassingly parallel: every signal is per-document, computed inside
    one `map_batches` with no exchange, via the shared
    `dedup.curation_signals` kernel. Reference analog: the keep/drop
    quality gate family (/root/reference/src/cur-prot/reclassify.py:23-38)
    extended with corpus-curation repetition rules."""
    from .dedup import curation_signals

    def rep(batch: pd.DataFrame) -> pd.DataFrame:
        sig = curation_signals(batch["text"].tolist())
        rep_pm, top_pm = repetition_permilles(sig)
        keep = (rep_pm < REP_SHINGLE_MAX_PERMILLE) & (
            top_pm < TOP_TOKEN_MAX_PERMILLE
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "n_tokens": sig["n_tok"],
                "top_tok_permille": top_pm,
                "dup_shingle_permille": rep_pm,
                "keep": keep.astype(np.int64),
            }
        )

    return docs_ds.map_batches(rep, batch_format="pandas")


def repetition_permilles(sig: dict) -> tuple[np.ndarray, np.ndarray]:
    """(dup_shingle_permille, top_tok_permille) from a
    `dedup.curation_signals` dict — shared with the fused pipeline."""
    n_sh, n_dist = sig["n_sh_pos"], sig["n_sh_dist"]
    rep_pm = np.zeros(len(n_sh), dtype=np.int64)
    nz = n_sh > 0
    rep_pm[nz] = (1000 * (n_sh[nz] - n_dist[nz])) // n_sh[nz]
    n_tok, top = sig["n_tok"], sig["top_tok"]
    top_pm = np.zeros(len(n_tok), dtype=np.int64)
    nz = n_tok > 0
    top_pm[nz] = (1000 * top[nz]) // n_tok[nz]
    return rep_pm, top_pm


def bib_compile(docs_ds):
    """S10 validate-then-compile sink analog (reference: BibTeX fragments
    validated line-by-line then concatenated into one sorted artifact,
    /root/reference/src/references/compile-bib-references.py:26-90): keep
    only documents passing the M19 line-shape rules, render each as one
    catalog entry string, emit in doc_id order — `"\\n".join` of the
    result column IS the compiled artifact. Validation and rendering are
    one vectorized map; the only exchange is the final sort. Gate = the
    M19 length rule alone (the terminal-punctuation rule would reject the
    whole synthetic corpus — an empty compile artifact checks nothing)."""

    def render(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        keep = pc.greater_equal(pc.utf8_length(text), VALIDATE_MIN_CHARS)
        t = batch.filter(keep)
        n = len(t)
        entry = pc.binary_join_element_wise(
            pa.array(["@doc{"] * n, type=pa.string()),
            pc.cast(t["doc_id"].combine_chunks(), pa.string()),
            pa.array([", source={"] * n, type=pa.string()),
            t["source"].combine_chunks(),
            pa.array(["}, nchars="] * n, type=pa.string()),
            pc.cast(t["n_chars"].combine_chunks(), pa.string()),
            pa.array(["}"] * n, type=pa.string()),
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "entry": entry})

    return docs_ds.map_batches(render, batch_format="pyarrow").sort("doc_id")


# ---- PII scrub (redaction pass, training-data curation core) ----------------

# RE2-safe and engine-identical: pyarrow's replace_substring_regex and
# DuckDB's regexp_replace(..., 'g') are both RE2, so scrubbed text matches
# byte-for-byte.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def plant_pii(batch_text: pa.ChunkedArray, doc_id: pa.ChunkedArray) -> pa.Array:
    """Deterministic PII augmentation: the synthetic corpus carries no
    PII, so the redaction pass would be an identity (an empty check).
    Appending one email + one phone derived from doc_id makes the scrub a
    real transformation the oracle verifies byte-for-byte; at deployment
    the plant step is dropped and `scrub_pii` runs on raw text."""
    did = pc.cast(doc_id, pa.string())
    # pyarrow has no modulo kernel — the tiny int op runs in numpy
    mod = (
        doc_id.combine_chunks()
        if isinstance(doc_id, pa.ChunkedArray)
        else doc_id
    ).to_numpy(zero_copy_only=False).astype(np.int64) % 10000
    tail_num = pc.utf8_lpad(
        pc.cast(pa.array(mod, type=pa.int64()), pa.string()),
        width=4, padding="0",
    )
    n = len(did)
    return pc.binary_join_element_wise(
        batch_text.combine_chunks() if isinstance(batch_text, pa.ChunkedArray)
        else batch_text,
        pa.array([" contact user"] * n, type=pa.string()),
        did.combine_chunks() if isinstance(did, pa.ChunkedArray) else did,
        pa.array(["@example.com tel +1-555-"] * n, type=pa.string()),
        tail_num.combine_chunks() if isinstance(tail_num, pa.ChunkedArray)
        else tail_num,
        pa.array(["."] * n, type=pa.string()),
        "",
    )


def pii_scrub(docs_ds):
    """PII redaction over documents: count then mask emails and phone
    numbers (<EMAIL> / <PHONE>), emitting (doc_id, scrubbed, n_emails,
    n_phones). Pure vectorized RE2 map — embarrassingly parallel, no
    exchange, the reference scrub-rule shape
    (/root/reference/src/cur-prot/dollar_sign_replace.py:21-41) applied
    to the web-scale privacy pass every training corpus needs."""

    def scrub(batch: pa.Table) -> pa.Table:
        planted = plant_pii(batch["text"], batch["doc_id"])
        n_em = pc.cast(
            pc.count_substring_regex(planted, pattern=PII_EMAIL_RE), pa.int64()
        )
        n_ph = pc.cast(
            pc.count_substring_regex(planted, pattern=PII_PHONE_RE), pa.int64()
        )
        out = pc.replace_substring_regex(
            planted, pattern=PII_EMAIL_RE, replacement="<EMAIL>"
        )
        out = pc.replace_substring_regex(
            out, pattern=PII_PHONE_RE, replacement="<PHONE>"
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "scrubbed": out,
                "n_emails": n_em,
                "n_phones": n_ph,
            }
        )

    return docs_ds.map_batches(scrub, batch_format="pyarrow")


URL_DOMAIN_RE = r"https?://(?P<domain>[A-Za-z0-9.-]+)"
N_DOMAINS = 50
DOMAIN_BLOCK_EVERY = 7  # site ids divisible by this are blocklisted


def default_blocklist() -> frozenset[str]:
    """The deterministic test blocklist: every DOMAIN_BLOCK_EVERY-th site.
    At deployment this is the curated domain denylist loaded from config —
    a dimension-sized set, broadcast once (`ray.put`), never shuffled."""
    return frozenset(
        f"site{i}.example" for i in range(0, N_DOMAINS, DOMAIN_BLOCK_EVERY)
    )


def plant_url(batch_text: pa.ChunkedArray, doc_id: pa.ChunkedArray) -> pa.Array:
    """Deterministic source-URL augmentation (same rationale as plant_pii):
    the synthetic corpus carries no URLs, so one is planted per document
    (domain = site{doc_id % N_DOMAINS}.example) to make extraction a real
    transformation the oracle verifies; at deployment the plant step is
    dropped and extraction runs on raw text/metadata."""
    mod = (
        doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id
    ).to_numpy(zero_copy_only=False).astype(np.int64) % N_DOMAINS
    site = pc.cast(pa.array(mod, type=pa.int64()), pa.string())
    n = len(site)
    return pc.binary_join_element_wise(
        batch_text.combine_chunks()
        if isinstance(batch_text, pa.ChunkedArray)
        else batch_text,
        pa.array([" src http://site"] * n, type=pa.string()),
        site,
        pa.array([".example/a"] * n, type=pa.string()),
        "",
    )


def domain_stats(docs_ds, blocked_ref):
    """Per-domain document counts + blocklist membership — the web-curation
    staple (C4/RefinedWeb-style source filtering): extract the first source
    domain per doc with a vectorized RE2 capture, test membership against a
    BROADCAST blocklist (one `ray.put`, map-side `Series.isin` hash lookup),
    then count per (domain, blocked) with the two-level hash aggregate.
    Only (domain, blocked, partial n) rows cross the exchange."""
    import ray

    from .hashagg import hash_aggregate

    def extract(batch: pa.Table) -> pd.DataFrame:
        blocked = ray.get(blocked_ref)
        planted = plant_url(batch["text"], batch["doc_id"])
        dom = pd.Series(
            pc.struct_field(
                pc.extract_regex(planted, pattern=URL_DOMAIN_RE), "domain"
            ).to_pandas()
        )
        out = (
            pd.DataFrame(
                {"domain": dom, "blocked": dom.isin(blocked).astype(np.int64)}
            )
            .groupby(["domain", "blocked"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return out

    return hash_aggregate(
        docs_ds.map_batches(extract, batch_format="pyarrow"),
        keys=["domain", "blocked"],
        aggs={"n_docs": ("n", "sum")},
    )


# ---- Gopher quality rule battery (Rae et al. 2021, arXiv:2112.11446) --------
# The full doc-level heuristic gate every web-scale curation pipeline runs
# before model scoring: word-count bounds, mean-word-length band, symbol
# (hash/ellipsis)-to-word ratio, alphabetic-word share, minimum stop-word
# hits. Reference analog: the rule side of the keep/drop classifier
# (/root/reference/src/cur-prot/reclassify.py:23-57 applies the model; the
# line-shape validator /root/reference/src/references/compile-bib-references.py:26-68
# is the rule-gate shape). All signals are integer (floored permille/milli)
# so the SQL oracle reproduces them bit-for-bit.
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 8, 100_000
GOPHER_WLEN_MIN_MILLI, GOPHER_WLEN_MAX_MILLI = 3_000, 10_000
GOPHER_MAX_SYMBOL_PERMILLE = 100
GOPHER_MIN_ALPHA_PERMILLE = 800
GOPHER_MIN_STOP_HITS = 2
# Deterministic plants (same rationale as plant_pii): the synthetic corpus
# is uniformly clean prose, so two artifact classes are planted to make the
# gate a real filter — symbol spam (fails the hash/ellipsis ratio) and
# digit-run spam (fails the alphabetic-word share). %13 wins when both hit.
GOPHER_SPAM_EVERY = 13
GOPHER_SPAM_TAIL = " ### ... ## #spam ... ###"
GOPHER_DIGIT_EVERY = 29
GOPHER_DIGIT_TAIL = " " + " ".join(str(i) * 3 for i in range(16))
# one match per whitespace-delimited token containing >=1 letter
RE_ALPHA_WORD = r"[^ \t\r\n\f\v]*[a-zà-öø-ÿ][^ \t\r\n\f\v]*"


def plant_gopher(batch_text, doc_id) -> pa.Array:
    did = (
        doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    tails = np.where(
        did % GOPHER_SPAM_EVERY == 0,
        GOPHER_SPAM_TAIL,
        np.where(did % GOPHER_DIGIT_EVERY == 0, GOPHER_DIGIT_TAIL, ""),
    )
    text = (
        batch_text.combine_chunks()
        if isinstance(batch_text, pa.ChunkedArray)
        else batch_text
    )
    return pc.binary_join_element_wise(
        text, pa.array(tails, type=pa.string()), ""
    )


def _gopher_rules_batch(batch: pa.Table) -> pa.Table:
    """The Gopher rule kernel shared by `gopher_quality` (signal report)
    and `gopher_filter` (fused in-place gate)."""
    from ..rules import RE_WHITESPACE
    from ..tokens import token_signals

    planted = plant_gopher(batch["text"], batch["doc_id"])
    n_words = (
        pc.count_substring_regex(planted, pattern=RE_NONWS)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    nonws_chars = (
        pc.utf8_length(
            pc.replace_substring_regex(
                planted, pattern=RE_WHITESPACE, replacement=""
            )
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_sym = (
        pc.count_substring(planted, pattern="#").to_numpy(zero_copy_only=False)
        + pc.count_substring(planted, pattern="...").to_numpy(
            zero_copy_only=False
        )
    ).astype(np.int64)
    n_alpha = (
        pc.count_substring_regex(planted, pattern=RE_ALPHA_WORD)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_stop = token_signals(planted)["n_en"]

    def ratio(num, scale):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.floor(scale * num / n_words)
        return np.where(n_words > 0, r, 0).astype(np.int64)

    wlen = ratio(nonws_chars, 1000.0)
    sym = ratio(n_sym, 1000.0)
    alpha = ratio(n_alpha, 1000.0)
    ok = n_words > 0
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (wlen >= GOPHER_WLEN_MIN_MILLI)
        & (wlen <= GOPHER_WLEN_MAX_MILLI)
        & (sym < GOPHER_MAX_SYMBOL_PERMILLE)
        & (alpha >= GOPHER_MIN_ALPHA_PERMILLE)
        & (n_stop >= GOPHER_MIN_STOP_HITS)
        & ok
    )
    maybe = lambda v: pa.array(  # noqa: E731 — NULL where no words
        [int(v[i]) if ok[i] else None for i in range(len(v))], type=pa.int64()
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words, type=pa.int64()),
            "mean_wlen_milli": maybe(wlen),
            "symbol_permille": maybe(sym),
            "alpha_permille": maybe(alpha),
            "n_stop": pa.array(n_stop, type=pa.int64()),
            "keep": pa.array(keep.tolist(), type=pa.bool_()),
        }
    )


def gopher_quality(docs_ds):
    """Per-doc Gopher rule signals + the composed keep verdict. Pure
    vectorized map — Arrow RE2 counts and one tokenize pass, no exchange,
    embarrassingly parallel at any corpus size."""
    return docs_ds.map_batches(_gopher_rules_batch, batch_format="pyarrow")


def gopher_filter(docs_ds):
    """Fused Gopher gate: the same verdict as `gopher_quality`, but the
    SURVIVING rows are emitted in place (all input columns preserved) —
    a pure map filter. The alternative (compute flags, join them back)
    ships every byte of corpus text through a shuffle; at web scale the
    gate must run where the text already is."""

    def gate(batch: pa.Table) -> pa.Table:
        keep = _gopher_rules_batch(batch)["keep"]
        return batch.filter(keep)

    return docs_ds.map_batches(gate, batch_format="pyarrow")


# ---- HTML text extraction (trafilatura-lite web-pipeline stage) --------------
# Web corpora arrive as markup; training text wants the prose. The plant
# wraps each document in a deterministic page skeleton (script block,
# nested tags, encoded entities) so extraction is a real transformation
# the oracle verifies byte-for-byte. Semantics (all RE2, same chain both
# engines, order matters): drop <script> blocks, strip every tag to a
# space, decode entities (&amp; LAST so double-encoded text can't
# double-decode), canonicalize whitespace.
RE_SCRIPT_BLOCK = r"<script[^>]*>[^<]*</script>"
RE_TAG = r"<[^>]*>"
HTML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&amp;", "&"))


def plant_html(batch_text, doc_id) -> pa.Array:
    did = pc.cast(
        doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id,
        pa.string(),
    )
    text = (
        batch_text.combine_chunks()
        if isinstance(batch_text, pa.ChunkedArray)
        else batch_text
    )
    n = len(did)

    def lit(s: str) -> pa.Array:
        return pa.array([s] * n, type=pa.string())

    return pc.binary_join_element_wise(
        lit('<html><head><title>doc '), did,
        lit('</title><script type="text/javascript">var x = '), did,
        lit(';</script></head><body><div class="main"><p>'), text,
        lit('</p></div><br/><footer>&amp; copyright &lt;2026&gt;</footer>'
            "</body></html>"),
        "",
    )


def html_strip(docs_ds):
    """Extract training prose from markup: emits (doc_id, clean_text,
    n_tags). Pure vectorized RE2 map — embarrassingly parallel, the
    canonical first stage of a web-crawl pipeline."""
    from ..rules import normalize_whitespace

    def strip(batch: pa.Table) -> pa.Table:
        planted = plant_html(batch["text"], batch["doc_id"])
        n_tags = pc.cast(
            pc.count_substring_regex(planted, pattern=RE_TAG), pa.int64()
        )
        out = pc.replace_substring_regex(
            planted, pattern=RE_SCRIPT_BLOCK, replacement=" "
        )
        out = pc.replace_substring_regex(out, pattern=RE_TAG, replacement=" ")
        for ent, ch in HTML_ENTITIES:
            out = pc.replace_substring(out, pattern=ent, replacement=ch)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": normalize_whitespace(out),
                "n_tags": n_tags,
            }
        )

    return docs_ds.map_batches(strip, batch_format="pyarrow")


# ---- PMI collocations --------------------------------------------------------
PMI_MIN_COUNT = 5
PMI_TOP_K = 20


def pmi_bigrams(docs_ds, min_count: int = PMI_MIN_COUNT, k: int = PMI_TOP_K):
    """Top-k collocations by pointwise-mutual-information LIFT
    (N·c(a,b) / (c(a)·c(b)), the PMI argument before the log — same
    ordering, no libm): the classic collocation-extraction pass
    (Church & Hanks 1990) a curation pipeline runs to find multi-word
    units worth protecting from tokenization/dedup.

    One explode pass emits BOTH row kinds — (t1, t2) adjacent-bigram and
    (t, '') unigram partials ('' is unreachable as a token since empties
    are filtered) — so corpus text is tokenized exactly once; one hash
    aggregate yields the vocabulary+bigram-bounded count artifact, which
    is materialized (it is the small intermediate, nothing corpus-sized).
    The unigram side of that artifact is VOCABULARY-bounded — the same
    class as the BPE merge table — so it is broadcast once (`ray.put`)
    and c(t1)/c(t2) resolve map-side by sorted-array searchsorted; the
    distributed-join form (hash_join bi⋈uni twice) is the fallback if a
    corpus's vocabulary ever outgrows broadcast. Lift is computed in
    EXACT Python-int rationals (1e6·N·c_ab overflows int64 at real
    corpus scale, so exactness beats vectorization here, the same trade
    source_divergence makes) over the bounded bigram table, which
    finishes with a combiner-pruned top-k.
    Emits (t1, t2, n_ab, lift_micro, rank)."""
    import ray

    from ..tokens import explode
    from .hashagg import hash_aggregate
    from .quantiles import group_topk

    def emit(batch: pa.Table) -> pd.DataFrame:
        rows, toks = explode(batch["text"].combine_chunks())
        if len(toks) == 0:
            return pd.DataFrame(
                {"t1": np.array([], dtype=object),
                 "t2": np.array([], dtype=object),
                 "n": np.array([], dtype=np.int64)}
            )
        adj = rows[1:] == rows[:-1]
        bi = pd.DataFrame({"t1": toks[:-1][adj], "t2": toks[1:][adj]})
        uni = pd.DataFrame({"t1": toks, "t2": ""})
        out = (
            pd.concat([bi, uni], ignore_index=True)
            .groupby(["t1", "t2"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return out

    counts = hash_aggregate(
        docs_ds.map_batches(emit, batch_format="pyarrow"),
        keys=["t1", "t2"],
        aggs={"n": ("n", "sum")},
    ).materialize()  # vocab+bigram bounded artifact; 2 consumers below

    # vocabulary-bounded driver artifact (BPE-merge-table class): sorted
    # token array + counts, broadcast once
    uni = counts.filter(expr="t2 == ''").to_pandas()
    uni = uni.sort_values("t1", kind="mergesort")
    n_total = int(uni["n"].sum())
    ref = ray.put(
        (uni["t1"].to_numpy(), uni["n"].to_numpy(dtype=np.int64), n_total)
    )

    bi = counts.filter(expr=f"t2 != '' and n >= {min_count}")

    def lift(batch: pd.DataFrame) -> pd.DataFrame:
        toks, cnts, nn = ray.get(ref)
        n_a = cnts[np.searchsorted(toks, batch["t1"].to_numpy())]
        n_b = cnts[np.searchsorted(toks, batch["t2"].to_numpy())]
        lm = [
            (1_000_000 * nn * int(ab)) // (int(a) * int(b))
            for ab, a, b in zip(batch["n"].tolist(), n_a, n_b)
        ]
        return pd.DataFrame(
            {
                "t1": batch["t1"],
                "t2": batch["t2"],
                "n_ab": batch["n"].astype(np.int64),
                "lift_micro": pd.Series(lm, dtype=np.int64, index=batch.index),
                "_g": np.int64(0),
            }
        )

    ranked = group_topk(
        bi.map_batches(lift, batch_format="pandas"),
        keys=["_g"],
        sort_col="lift_micro",
        k=k,
        tie_cols=["t1", "t2"],
    )
    return ranked.drop_columns(["_g"])


SKIPGRAM_WINDOW = 3
SKIPGRAM_TOP_K = 20


def skipgram_pairs(docs_ds, window: int = SKIPGRAM_WINDOW,
                   k: int = SKIPGRAM_TOP_K):
    """Windowed co-occurrence counts — the skip-gram statistics (ordered
    pairs within `window` token positions) that word-embedding training
    and collocation mining consume; pmi_bigrams' adjacency is the
    window=1 special case. Per batch the pair stream is `window`
    shifted-equality passes over the shared explode kernel (no Python
    row loop), combined per batch before ONE hash aggregate; the bounded
    pair-count table finishes with a combiner-pruned top-k.
    Emits (t1, t2, n, rank) for the k most frequent pairs
    (ties: t1, t2 asc)."""
    from ..tokens import explode
    from .hashagg import hash_aggregate
    from .quantiles import group_topk

    def emit(batch: pa.Table) -> pd.DataFrame:
        rows, toks = explode(batch["text"].combine_chunks())
        n = len(toks)
        if n == 0:
            return pd.DataFrame(
                {"t1": np.array([], dtype=object),
                 "t2": np.array([], dtype=object),
                 "n": np.array([], dtype=np.int64)}
            )
        frames = []
        for g in range(1, window + 1):
            if n <= g:
                break
            same = rows[g:] == rows[:-g]
            frames.append(
                pd.DataFrame({"t1": toks[:-g][same], "t2": toks[g:][same]})
            )
        if not frames:
            return pd.DataFrame(
                {"t1": np.array([], dtype=object),
                 "t2": np.array([], dtype=object),
                 "n": np.array([], dtype=np.int64)}
            )
        return (
            pd.concat(frames, ignore_index=True)
            .groupby(["t1", "t2"], sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = hash_aggregate(
        docs_ds.map_batches(emit, batch_format="pyarrow"),
        keys=["t1", "t2"],
        aggs={"n": ("n", "sum")},
    )
    ranked = group_topk(
        counts.map_batches(
            lambda b: b.assign(_g=np.int64(0)), batch_format="pandas"
        ),
        keys=["_g"],
        sort_col="n",
        k=k,
        tie_cols=["t1", "t2"],
    )
    return ranked.drop_columns(["_g"])


def ttr_by_source(docs_ds):
    """Lexical diversity per source — type-token ratio, a standard
    quality-filter signal (template-generated or spammy sources have
    few types per token). Two-level path: per-batch (source, tok)
    partial counts combine inside the map stage, the (source, tok)
    exchange carries vocabulary-cardinality rows (never token
    instances), and a second aggregate keyed on the bounded source set
    folds each source's vocab rows into (n_types, n_tokens). The ratio
    is emitted as integer permille (floor) so the SQL oracle matches
    bit-for-bit. Emits (source, n_types, n_tokens, ttr_permille)."""
    from ..tokens import explode
    from .hashagg import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        if len(toks) == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "tok": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        src = batch["source"].to_numpy(dtype=object)[rows]
        return (
            pd.DataFrame({"source": src, "tok": toks})
            .groupby(["source", "tok"], sort=False)
            .size()
            .reset_index(name="n")
        )

    per_tok = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        keys=["source", "tok"],
        aggs={"n": ("n", "sum")},
    )
    per_src = hash_aggregate(
        per_tok,
        keys=["source"],
        aggs={"n_types": ("tok", "count"), "n_tokens": ("n", "sum")},
    )

    def ratio(batch: pd.DataFrame) -> pd.DataFrame:
        batch["ttr_permille"] = (
            1000 * batch["n_types"].to_numpy(dtype=np.int64)
        ) // batch["n_tokens"].to_numpy(dtype=np.int64)
        return batch

    return per_src.map_batches(ratio, batch_format="pandas")


URL_SITES = 17       # distinct canonical pages in the plant
URL_VARIANTS = 4     # surface forms per page


def plant_messy_url(doc_id) -> pa.Array:
    """Deterministic messy-URL plant for the canonicalizer (plant_pii
    rationale: the synthetic corpus has no URLs): site = doc_id %
    URL_SITES picks the page, doc_id % URL_VARIANTS one of four surface
    forms — mixed-case host, trailing slash, tracking query, fragment —
    that must all collapse to one canonical URL, so canonical collisions
    exist by construction."""
    ids = (
        doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    s = pd.Series(ids % URL_SITES).astype(str)
    v = ids % URL_VARIANTS
    forms = [
        "https://Site" + s + ".Example.com/path/" + s + "/page",
        "https://site" + s + ".example.com/path/" + s + "/page/",
        "https://site" + s + ".example.com/path/" + s
        + "/page?utm_source=feed&ref=rss",
        "https://SITE" + s + ".EXAMPLE.com/path/" + s + "/page#frag",
    ]
    url = np.select([v == i for i in range(URL_VARIANTS)],
                    [f.to_numpy(dtype=object) for f in forms])
    return pa.array(url, type=pa.string())


def url_canon(docs_ds):
    """URL canonicalization + first-wins URL dedup — the crawl-frontier /
    web-corpus staple (the same page fetched under tracking params,
    fragments, case-variant hosts and trailing slashes must count once).
    Canonical form: strip fragment, strip query string, strip trailing
    slashes, lowercase (the synthetic plant has no case-significant path,
    so whole-string lowering is documented simplification — RE2 chain
    identical in both engines). The canonicalize step is a pure
    vectorized map; the only exchange carries (doc_id, url, canon_url)
    rows keyed on canon_url, where first-wins membership is one
    vectorized group-min compare. Emits (doc_id, url, canon_url,
    keep)."""
    from .hashagg import map_partitions_by_key

    def canon(batch: pa.Table) -> pa.Table:
        url = plant_messy_url(batch["doc_id"])
        c = pc.replace_substring_regex(url, pattern=r"#.*$", replacement="")
        c = pc.replace_substring_regex(c, pattern=r"\?.*$", replacement="")
        c = pc.replace_substring_regex(c, pattern=r"/+$", replacement="")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": url,
                "canon_url": pc.utf8_lower(c),
            }
        )

    def first_wins(part: pd.DataFrame) -> pd.DataFrame:
        ids = part["doc_id"].to_numpy(dtype=np.int64)
        part["keep"] = ids == part.groupby("canon_url", sort=False)[
            "doc_id"
        ].transform("min").to_numpy(dtype=np.int64)
        return part

    return map_partitions_by_key(
        docs_ds.map_batches(canon, batch_format="pyarrow"),
        "canon_url",
        first_wins,
    )


def simpson_by_source(docs_ds):
    """Gini-Simpson lexical concentration per source — the libm-free
    companion of entropy (Σp², the chance two random tokens coincide;
    high = templated/repetitive source, the complement of ttr_by_source's
    type coverage). Same (source, tok) vocabulary-cardinality exchange as
    ttr_by_source; the per-source second moment is folded with PYTHON-int
    (object-dtype) arithmetic in the bounded final pass, so Σn² stays
    exact past int64 (the SQL twin uses HUGEINT). simpson_micro =
    (10⁶·Σn²) // N². Emits (source, n_tokens, simpson_micro)."""
    from ..tokens import explode
    from .hashagg import hash_aggregate, map_partitions_by_key

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        if len(toks) == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "tok": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        src = batch["source"].to_numpy(dtype=object)[rows]
        return (
            pd.DataFrame({"source": src, "tok": toks})
            .groupby(["source", "tok"], sort=False)
            .size()
            .reset_index(name="n")
        )

    per_tok = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        keys=["source", "tok"],
        aggs={"n": ("n", "sum")},
    )

    def moments(part: pd.DataFrame) -> pd.DataFrame:
        n = part["n"].astype(object)  # exact Python-int arithmetic
        g = pd.DataFrame({"source": part["source"], "m2": n * n, "nt": n})
        agg = g.groupby("source", sort=False).sum()
        return pd.DataFrame(
            {
                "source": agg.index.to_numpy(dtype=object),
                "n_tokens": agg["nt"].astype(np.int64).to_numpy(),
                "simpson_micro": np.array(
                    [
                        (1_000_000 * int(m2)) // (int(nt) * int(nt))
                        for m2, nt in zip(agg["m2"], agg["nt"])
                    ],
                    dtype=np.int64,
                ),
            }
        )

    return map_partitions_by_key(per_tok, "source", moments)


VOCAB_V = 20      # vocabulary size (top-V by corpus count)
VOCAB_MIN = 5     # min corpus count to enter the vocabulary


def vocab_oov(docs_ds_fn, v: int = VOCAB_V, min_count: int = VOCAB_MIN):
    """Tokenizer-vocabulary coverage report: build the top-`v` corpus
    vocabulary (count >= min_count, ties by token) and report each
    source's out-of-vocabulary rate — the pre-tokenizer sanity check
    (a source with high OOV under the planned vocab will fragment into
    bytes). Two passes over the factory (`docs_ds_fn` — the N-consumer
    re-execution contract): pass 1 aggregates (tok, n) at vocabulary
    cardinality and prunes each disjoint output partition to its local
    top-v before a bounded driver merge (v × partitions rows, never the
    vocab); pass 2 re-tokenizes with the vocab broadcast once and folds
    per-source OOV counts. Emits (source, n_tokens, n_oov,
    oov_permille)."""
    import ray

    from ..tokens import explode
    from .hashagg import hash_aggregate

    def tok_partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        return (
            pd.DataFrame({"tok": toks})
            .groupby("tok", sort=False)
            .size()
            .reset_index(name="n")
        )

    def local_topv(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["n"] >= min_count]
        return batch.sort_values(
            ["n", "tok"], ascending=[False, True], kind="mergesort"
        ).head(v)

    cand = (
        hash_aggregate(
            docs_ds_fn().map_batches(tok_partial, batch_format="pandas"),
            keys=["tok"],
            aggs={"n": ("n", "sum")},
        )
        .map_batches(local_topv, batch_format="pandas")
        .to_pandas()
    )
    vocab = set(
        cand.sort_values(["n", "tok"], ascending=[False, True],
                         kind="mergesort").head(v)["tok"]
    )
    vref = ray.put(vocab)

    def oov_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vset = ray.get(vref)
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        if len(toks) == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "n_oov": pd.Series([], dtype=np.int64),
                }
            )
        src = batch["source"].to_numpy(dtype=object)[rows]
        oov = ~np.isin(toks, list(vset))
        return (
            pd.DataFrame(
                {"source": src,
                 "n_tokens": np.ones(len(toks), dtype=np.int64),
                 "n_oov": oov.astype(np.int64)}
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_aggregate(
        docs_ds_fn().map_batches(oov_partial, batch_format="pandas"),
        keys=["source"],
        aggs={"n_tokens": ("n_tokens", "sum"), "n_oov": ("n_oov", "sum")},
    )

    def rate(batch: pd.DataFrame) -> pd.DataFrame:
        batch["oov_permille"] = (
            1000 * batch["n_oov"].to_numpy(dtype=np.int64)
        ) // batch["n_tokens"].to_numpy(dtype=np.int64)
        return batch

    return agg.map_batches(rate, batch_format="pandas")


COMPRESS_LEVEL = 6  # pinned zlib level: the ratio is part of the contract


def compress_ratio(docs_ds, level: int = COMPRESS_LEVEL):
    """Compression-ratio quality signal (the Gopher-family proxy:
    highly repetitive/templated text compresses far better than prose;
    near-random noise barely compresses). ratio_micro =
    floor(1e6 · deflate_len / utf8_len) at a PINNED zlib level — zlib's
    DEFLATE output is deterministic for a fixed level/strategy, so the
    column is stable across runs and workers. Pure per-row C-call map
    (no vectorized zlib exists — the same per-row-C-kernel shape as the
    md5 exhibits); no exchange. DuckDB has no zlib, so this operator is
    rows-only by documented design (semantics pinned by the planted
    repetitive/noise pytest). Emits (doc_id, raw_len, comp_len,
    ratio_micro)."""
    import zlib

    def ratio(batch: pd.DataFrame) -> pd.DataFrame:
        raw = [t.encode("utf-8") for t in batch["text"].tolist()]
        comp = np.array([len(zlib.compress(b, level)) for b in raw],
                        dtype=np.int64)
        rl = np.array([len(b) for b in raw], dtype=np.int64)
        if len(rl) and rl.min() <= 0:
            raise ValueError("compress_ratio: empty document text")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "raw_len": rl,
                "comp_len": comp,
                "ratio_micro": (1_000_000 * comp) // rl,
            }
        )

    return docs_ds.map_batches(ratio, batch_format="pandas")


def compress_ratio_fixed(docs_ds):
    """Value-checked twin of `compress_ratio` (the ann_ivf_fixed /
    bpe_budgets_fixed pattern): the compression function is pinned to
    character-level RLE — n_runs = number of maximal runs of identical
    code points — which DuckDB can restate exactly (string_split('') +
    an indexed list lambda), unlike zlib's DEFLATE. Same signal shape
    (repetitive text → few runs → low ratio; diverse prose → ratio near
    1000000·1/1), same output contract (doc_id, raw_len, n_runs,
    ratio_micro = 10⁶·n_runs // raw_len), same loud empty-text error.

    Kernel: one utf-32 encode of the batch-joined text, one vectorized
    neighbor-compare, per-doc run counts via prefix sums at the char
    offsets — no per-row Python beyond the C-speed join/encode."""

    def ratio(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].tolist()
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        if len(lens) and lens.min() <= 0:
            raise ValueError("compress_ratio_fixed: empty document text")
        arr = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        )
        # cs[i] = number of neighbor changes among positions [0, i)
        changes = np.concatenate(
            [[0], (arr[1:] != arr[:-1]).astype(np.int64)]
        ).cumsum()
        ends = lens.cumsum()
        starts = ends - lens
        # runs within a doc = 1 + changes strictly inside its char span
        n_runs = 1 + changes[ends - 1] - changes[starts]
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
                "raw_len": lens,
                "n_runs": n_runs,
                "ratio_micro": (1_000_000 * n_runs) // lens,
            }
        )

    return docs_ds.map_batches(ratio, batch_format="pandas")


def qf_funnel(qf_ds):
    """Drop-reason funnel of the flagship quality filter — the report a
    curation run ships with (how many turns each gate removed, as a
    share of the stream): per-stage counts from ONE bounded hash
    aggregate over the pipeline's (keep, drop_reason) columns, kept rows
    folded in as the 'kept' stage; the permille shares are a
    dimension-sized driver fold (≤ #gates rows), the standard report
    shape. Emits (stage, n, permille)."""
    from .hashagg import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        stage = batch["drop_reason"].astype(object).where(
            ~batch["keep"], "kept"
        )
        return (
            pd.DataFrame({"stage": stage})
            .groupby("stage", sort=False)
            .size()
            .reset_index(name="n")
        )

    agg = hash_aggregate(
        qf_ds.map_batches(partial, batch_format="pandas"),
        keys=["stage"],
        aggs={"n": ("n", "sum")},
    ).to_pandas()
    # pre-aggregated per batch before the exchange: re-sum per stage
    total = int(agg["n"].sum())
    agg["permille"] = (1000 * agg["n"].astype(np.int64)) // total
    return agg.sort_values("stage", kind="mergesort").reset_index(drop=True)


def lang_source_chi2(docs_ds):
    """(lang × source) independence audit — the corpus-bias check
    (is language distribution independent of source, or does one crawl
    carry all of one language): per observed cell the count, the
    expected count under independence and the cell's chi-square
    contribution, all in EXACT integer micro units (Python-int
    arithmetic over the bounded langs × sources matrix here, HUGEINT in
    the SQL twin — (o·N − r·c)² overflows int64 at corpus scale). One
    two-level count aggregate; margins need every cell, so the fold is
    the dimension-sized driver pattern (like source_divergence). Emits
    (lang, source, n, expected_micro, chi2_micro)."""
    from .hashagg import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.groupby(["lang", "source"], sort=False)
            .size()
            .reset_index(name="n")
        )

    cells = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        keys=["lang", "source"],
        aggs={"n": ("n", "sum")},
    ).to_pandas()
    rl = cells.groupby("lang")["n"].sum().to_dict()
    cs = cells.groupby("source")["n"].sum().to_dict()
    big_n = int(cells["n"].sum())
    exp, chi = [], []
    for lang, source, o in cells[["lang", "source", "n"]].itertuples(
        index=False
    ):
        r, c, o = int(rl[lang]), int(cs[source]), int(o)
        exp.append((1_000_000 * r * c) // big_n)
        d = o * big_n - r * c
        chi.append((1_000_000 * d * d) // (r * c * big_n))
    cells["expected_micro"] = np.array(exp, dtype=np.int64)
    cells["chi2_micro"] = np.array(chi, dtype=np.int64)
    return cells


TREND_TOP_K = 5


def trending_terms(trans_ds, k: int = TREND_TOP_K):
    """Per-day trending terms over the turn stream — the monitoring view
    of a live corpus (what surged today): (day, term) count partials →
    one hash aggregate at day × vocabulary cardinality → grouped top-k
    with its per-batch combiner prune (no global sort, hot days bounded
    at k rows per batch on the exchange). Emits (day, term, n, rank)."""
    from ..tokens import explode
    from .hashagg import hash_aggregate
    from .quantiles import group_topk

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        if len(toks) == 0:
            return pd.DataFrame(
                {
                    "day": pd.Series([], dtype=np.int64),
                    "term": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        day = batch["ts"].dt.day.astype(np.int64).to_numpy()[rows]
        return (
            pd.DataFrame({"day": day, "term": toks})
            .groupby(["day", "term"], sort=False)
            .size()
            .reset_index(name="n")
        )

    counts = hash_aggregate(
        trans_ds.map_batches(partial, batch_format="pandas"),
        keys=["day", "term"],
        aggs={"n": ("n", "sum")},
    )
    return group_topk(counts, keys=["day"], sort_col="n", k=k,
                      tie_cols=["term"])


def vocab_growth(trans_ds):
    """Vocabulary-growth curve over the stream — the corpus-freshness
    analytic (is new data still contributing new types, or has the crawl
    saturated): per calendar day, the count of token types whose FIRST
    occurrence is that day, plus the running cumulative vocabulary. One
    (tok → min day) aggregate at vocabulary cardinality; the per-day
    fold and cumsum are dimension-sized (days), the standard report
    fold. Emits (day, n_new_types, n_types_cum)."""
    from ..tokens import explode
    from .hashagg import hash_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows, toks = explode(pa.array(batch["text"].tolist(), type=pa.string()))
        if len(toks) == 0:
            return pd.DataFrame(
                {
                    "tok": pd.Series([], dtype=object),
                    "day": pd.Series([], dtype=np.int64),
                }
            )
        day = batch["ts"].dt.day.astype(np.int64).to_numpy()[rows]
        return (
            pd.DataFrame({"tok": toks, "day": day})
            .groupby("tok", sort=False)
            .min()
            .reset_index()
        )

    first = hash_aggregate(
        trans_ds.map_batches(partial, batch_format="pandas"),
        keys=["tok"],
        aggs={"day": ("day", "min")},
    )
    per_day = hash_aggregate(
        first, keys=["day"], aggs={"n_new_types": ("tok", "count")}
    ).to_pandas().sort_values("day", kind="mergesort").reset_index(drop=True)
    per_day["n_types_cum"] = per_day["n_new_types"].cumsum().astype(np.int64)
    return per_day


def lang_mismatch(docs_ds):
    """Language-audit report — declared metadata vs detected language
    (upstream metadata lies; the mismatch share per source tells you
    whose): ONE pass computing the stopword-vote detection (the
    lang_docs rule, SQL-reproducible) against the declared `lang`
    column, folded to per-source counts through the bounded aggregate.
    Emits (source, n_docs, n_mismatch, mismatch_permille)."""
    from .hashagg import hash_aggregate

    def partial(batch: pa.Table) -> pd.DataFrame:
        sig = token_signals(batch["text"].combine_chunks())
        detected = np.asarray(detect_lang(sig["n_sv"], sig["n_en"]),
                              dtype=object)
        declared = batch["lang"].to_numpy(zero_copy_only=False)
        return (
            pd.DataFrame(
                {
                    "source": batch["source"].to_numpy(zero_copy_only=False),
                    "n_docs": np.ones(len(declared), dtype=np.int64),
                    "n_mismatch": (detected != declared).astype(np.int64),
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        keys=["source"],
        aggs={"n_docs": ("n_docs", "sum"), "n_mismatch": ("n_mismatch", "sum")},
    )

    def rate(batch: pd.DataFrame) -> pd.DataFrame:
        batch["mismatch_permille"] = (
            1000 * batch["n_mismatch"].to_numpy(dtype=np.int64)
        ) // batch["n_docs"].to_numpy(dtype=np.int64)
        return batch

    return agg.map_batches(rate, batch_format="pandas")


def gopher_rate_by_source(docs_ds_fn):
    """Gopher-gate pass rate per source — which crawl is burning the
    quality budget: the gate runs once (its own value-checked plant +
    rules), survivors join back to the doc→source map on the
    distributed hash join (doc cardinality), then the bounded per-source
    fold. Emits (source, n_docs, n_keep, keep_permille)."""
    from .hashagg import hash_aggregate, hash_join

    gated = gopher_quality(docs_ds_fn()).map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype(np.int64),
                "n_keep": b["keep"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = hash_join(
        gated,
        docs_ds_fn().map_batches(
            lambda b: pd.DataFrame(
                {"doc_id2": b["doc_id"].astype(np.int64),
                 "source": b["source"]}
            ),
            batch_format="pandas",
        ),
        on="doc_id",
        right_on="doc_id2",
        how="inner",
    )
    agg = hash_aggregate(
        joined,
        keys=["source"],
        aggs={"n_docs": ("n_keep", "count"), "n_keep": ("n_keep", "sum")},
    )

    def rate(batch: pd.DataFrame) -> pd.DataFrame:
        batch["keep_permille"] = (
            1000 * batch["n_keep"].to_numpy(dtype=np.int64)
        ) // batch["n_docs"].to_numpy(dtype=np.int64)
        return batch

    return agg.map_batches(rate, batch_format="pandas")

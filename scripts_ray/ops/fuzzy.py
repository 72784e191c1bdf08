"""Fuzzy-string entity matching: the ordered matcher ladder (ML5 depth).

The reference's core person matcher is a ladder of seven *textdistance*
matching functions tried in order — `in_name`, `fuzzy_name`,
`subnames_in_mpname`, `mpsubnames_in_name`, `firstname_lastname`,
`two_lastnames`, `firstname_lastname_reversed`
(/root/reference/src/fuzzy_matching.py:75-76, applied per row at :92) —
where each matcher claims a probe only when it resolves to a UNIQUE
registry entity; an ambiguous or empty result falls through to the next
tier, and a probe no tier resolves is emitted as 'unknown' (:95-103).

This module re-derives that semantics engine-side with seven tiers over a
canonical name registry (distinct `p_name` → min `p_partkey`, the entity
table analog of the cleaned MP registry):

1. ``exact``     — probe equals a registry name (reference `in_name`);
2. ``tokenset``  — same token multiset, order-insensitive;
3. ``subset``    — every token of a registry name appears in the probe
   (reference `mpsubnames_in_name`: the registry entity's subnames are
   contained in the noisy probe);
4. ``lev``       — minimum Levenshtein distance ≤ FUZZY_MAX_DIST with a
   unique argmin (reference `fuzzy_name`, textdistance levenshtein);
5. ``first_last``     — probe's FIRST and LAST tokens equal a registry
   name's first and last tokens, middle tokens ignored (reference
   `firstname_lastname`);
6. ``two_last``       — probe's last TWO tokens equal a registry name's
   last two (reference `two_lastnames`);
7. ``first_last_rev`` — probe's (first, last) equal a registry name's
   (last, first): the "Lastname Firstname" ordering (reference
   `firstname_lastname_reversed`).

The positional tiers 5-7 only consider probes and registry names with
≥ 2 tokens, and like every tier claim a probe only when exactly ONE
registry form qualifies (ambiguous forms are dropped from the tier map
at registry build time).

Every tier resolves a probe only when exactly ONE entity qualifies; ties
fall through — the reference's uniqueness rule, and the property that
makes the whole ladder expressible in SQL (DuckDB `levenshtein()`,
`list_sort`, `list_has_all`) for a full value check.

Execution shape (100 TB honest):
- the registry is DIMENSION-sized (entities, not corpus rows): packed
  once on the driver into plain arrays/dicts and broadcast via ONE
  ``ray.put`` ref;
- each batch first COLLAPSES to its distinct probes (entity resolution is
  a function of the probe string, so the match is computed once per
  distinct probe and scattered back — occurrences never multiply work);
- tier kernels are vectorized: dict maps for exact/tokenset, a pandas
  hash-merge against the registry's token table for subset, and a
  batched numpy DP over all (probe, candidate) pairs at once for the
  Levenshtein tier, with lossless length-band blocking
  (|len(a) − len(b)| ≤ d is necessary for distance ≤ d) so the pair set
  never goes all-pairs. The only Python loops run once per DISTINCT
  probe (string split/encode), bounded by the probe vocabulary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

FUZZY_MAX_DIST = 2
# Tier ORDER is intentionally different from the reference cascade
# (/root/reference/src/fuzzy_matching.py:75 applies the Levenshtein
# `fuzzy_name` matcher BEFORE the subset and positional matchers): this
# ladder runs the cheap deterministic set-algebra tiers (tokenset, subset)
# before the edit-distance DP so most probes never reach the O(len²)
# kernel. A probe that both tiers would attribute DIFFERENTLY therefore
# resolves to the subset answer here; the DuckDB oracle
# (FUZZY_ATTRIBUTION_SQL's COALESCE chain) encodes this same order.
DEFAULT_LADDER = (
    "exact", "tokenset", "subset", "lev",
    "first_last", "two_last", "first_last_rev",
)
N_PROBE_MODES = 8
GARBAGE_MOD = 97


# ---- registry ---------------------------------------------------------------


def build_registry(t: pd.DataFrame) -> dict:
    """Pack a (p_partkey, p_name) frame into the broadcastable registry
    (ONE bundled object for a single ``ray.put``):

    - ``part_names``: p_name indexed by p_partkey (probe construction);
    - ``exact`` / ``tokenset`` / ``first_last`` / ``two_last`` /
      ``first_last_rev``: name-form → entity key dicts holding ONLY
      unique forms (an ambiguous form is absent → the tier passes);
    - ``token_df``: (token, key, ntok) rows for the subset-tier merge;
    - ``codes`` / ``lens`` / ``keys`` sorted by name length, plus the
      padded uint8 code matrix for the batched Levenshtein DP.
    """
    part_names = (
        t.sort_values("p_partkey")["p_name"].to_numpy(dtype=object)
    )
    g = t.groupby("p_name", sort=True)["p_partkey"].min()
    names = g.index.to_numpy(dtype=object)
    keys = g.to_numpy(dtype=np.int64)
    tok_lists = [n.split() for n in names]

    def unique_map(forms, ks) -> dict:
        s = pd.Series(ks, index=forms)
        counts = s.groupby(level=0).size()
        uniq = counts.index[counts.to_numpy() == 1]
        return s[s.index.isin(uniq)].to_dict()

    def positional_map(form_of) -> dict:
        # tiers 5-7 only consider names with >= 2 tokens
        multi = [i for i, tl in enumerate(tok_lists) if len(tl) >= 2]
        return unique_map(
            [form_of(tok_lists[i]) for i in multi], keys[multi]
        )

    sorted_forms = np.array(
        [" ".join(sorted(tl)) for tl in tok_lists], dtype=object
    )
    tok_rows = [
        (tok, k, len(set(tl)))
        for tl, k in zip(tok_lists, keys)
        for tok in set(tl)
    ]
    token_df = pd.DataFrame(tok_rows, columns=["token", "key", "ntok"])

    lens = np.array([len(n) for n in names], dtype=np.int64)
    order = np.argsort(lens, kind="stable")
    codes = _encode(names[order], int(lens.max()))
    return {
        "part_names": part_names,
        "exact": unique_map(names, keys),
        "tokenset": unique_map(sorted_forms, keys),
        "first_last": positional_map(lambda tl: tl[0] + " " + tl[-1]),
        "two_last": positional_map(lambda tl: tl[-2] + " " + tl[-1]),
        "first_last_rev": positional_map(lambda tl: tl[-1] + " " + tl[0]),
        "token_df": token_df,
        "lens_sorted": lens[order],
        "keys_sorted": keys[order],
        "codes_sorted": codes,
    }


def build_name_registry(sf_dir: str) -> dict:
    """Registry from the part table parquet (see ``build_registry``)."""
    import pyarrow.parquet as pq

    return build_registry(
        pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
        ).to_pandas()
    )


def _encode(strs: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint8 code matrix, zero-padded. Runs once per distinct
    string (bounded by the probe/registry vocabulary), byte-level —
    Levenshtein on bytes equals Levenshtein on chars for ASCII names."""
    out = np.zeros((len(strs), width), dtype=np.uint8)
    for i, s in enumerate(strs):
        b = s.encode("utf-8")[:width]
        out[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out


# ---- batched Levenshtein ----------------------------------------------------


def lev_pairs(a_codes: np.ndarray, a_len: np.ndarray,
              b_codes: np.ndarray, b_len: np.ndarray) -> np.ndarray:
    """Levenshtein distance for n (a, b) PAIRS at once: one DP whose outer
    loop runs over character positions of `a` (≤ max length) and whose
    inner recurrence is fully vectorized over pairs. The left-to-right
    insertion chain cur[j] = min(cur[j-1]+1, …) — normally a sequential
    scan — becomes `min.accumulate(row - j) + j` (each insertion step adds
    exactly 1, so subtracting the column index turns the chain into a
    running minimum). Scratch buffers are allocated once and reused per
    iteration (fresh big allocations per step page-fault heavily on this
    host)."""
    n, La = a_codes.shape
    Lb = b_codes.shape[1]
    ar = np.arange(Lb + 1, dtype=np.int16)
    prev = np.broadcast_to(ar, (n, Lb + 1)).copy()
    row = np.empty((n, Lb + 1), dtype=np.int16)
    tmp = np.empty((n, Lb + 1), dtype=np.int16)
    for i in range(1, La + 1):
        cost = (a_codes[:, i - 1 : i] != b_codes).astype(np.int16)
        row[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=row[:, 1:])
        np.subtract(row, ar, out=tmp)
        np.minimum.accumulate(tmp, axis=1, out=tmp)
        np.add(tmp, ar, out=tmp)
        act = i <= a_len
        prev[act] = tmp[act]
    return prev[np.arange(n), b_len].astype(np.int64)


# ---- the ladder -------------------------------------------------------------


def _subset_match(sub: np.ndarray, reg: dict) -> pd.Series:
    """Tier 3: registry entities whose every token appears in the probe
    (set semantics), resolved via one hash-merge of the probe token frame
    against the registry token table — no per-candidate Python. Returns a
    float Series indexed 0..len(sub)-1 (NaN = no unique match)."""
    s = pd.Series(sub, dtype=object)
    tok = s.str.split().explode()
    df = (
        pd.DataFrame({"pi": tok.index.to_numpy(), "token": tok.to_numpy()})
        .drop_duplicates()
    )
    j = df.merge(reg["token_df"], on="token")
    out = pd.Series(np.nan, index=range(len(sub)))
    if len(j) == 0:
        return out
    cnt = j.groupby(["pi", "key", "ntok"]).size().reset_index(name="c")
    full = cnt[cnt["c"] == cnt["ntok"]]
    agg = full.groupby("pi")["key"].agg(["count", "min"])
    uniq = agg[agg["count"] == 1]["min"]
    out[uniq.index] = uniq.to_numpy()
    return out


def _lev_match(sub: np.ndarray, reg: dict, max_dist: int) -> pd.Series:
    """Tier 4: unique Levenshtein argmin ≤ max_dist, with lossless
    length-band blocking — candidate pairs are built vectorized from the
    length-sorted registry (searchsorted bounds + repeat/arange), then one
    batched DP scores every pair."""
    out = pd.Series(np.nan, index=range(len(sub)))
    if len(sub) == 0:
        return out
    plen = np.array([len(s) for s in sub], dtype=np.int64)
    lens = reg["lens_sorted"]
    lo = np.searchsorted(lens, plen - max_dist, side="left")
    hi = np.searchsorted(lens, plen + max_dist, side="right")
    cnt = hi - lo
    total = int(cnt.sum())
    if total == 0:
        return out
    pi = np.repeat(np.arange(len(sub)), cnt)
    starts = np.cumsum(cnt) - cnt
    within = np.arange(total) - np.repeat(starts, cnt)
    cand = np.repeat(lo, cnt) + within

    a_codes = _encode(sub, int(plen.max()))
    d = lev_pairs(
        a_codes[pi], plen[pi], reg["codes_sorted"][cand], lens[cand]
    )
    dfp = pd.DataFrame({"pi": pi, "key": reg["keys_sorted"][cand], "d": d})
    md = dfp.groupby("pi")["d"].transform("min")
    best = dfp[(dfp["d"] == md) & (dfp["d"] <= max_dist)]
    if len(best) == 0:
        return out
    agg = best.groupby("pi")["key"].agg(["count", "min"])
    uniq = agg[agg["count"] == 1]["min"]
    out[uniq.index] = uniq.to_numpy()
    return out


def match_ladder(probes: np.ndarray, reg: dict,
                 ladder: tuple[str, ...] = DEFAULT_LADDER,
                 max_dist: int = FUZZY_MAX_DIST):
    """Run the ordered matcher ladder over DISTINCT probe strings: each
    tier sees only probes unresolved by earlier tiers and claims the ones
    it matches uniquely (reference /root/reference/src/fuzzy_matching.py:92
    — `match_mp` tries `matching_funs` in order). Reordering or truncating
    `ladder` observably changes the match_type distribution (§2.9).
    Returns (keys int64, types object) aligned with `probes`."""
    for t in ladder:
        if t not in DEFAULT_LADDER:
            raise ValueError(f"unknown fuzzy tier: {t!r}")
    m = len(probes)
    keys = np.full(m, -1, dtype=np.int64)
    types = np.full(m, "unknown", dtype=object)
    open_ = np.ones(m, dtype=bool)
    for tier in ladder:
        if not open_.any():
            break
        idx = np.nonzero(open_)[0]
        sub = probes[idx]
        if tier == "exact":
            got = pd.Series(sub, dtype=object).map(reg["exact"])
        elif tier == "tokenset":
            norm = np.array(
                [" ".join(sorted(s.split())) for s in sub], dtype=object
            )
            got = pd.Series(norm, dtype=object).map(reg["tokenset"])
        elif tier == "subset":
            got = _subset_match(sub, reg)
        elif tier == "lev":
            got = _lev_match(sub, reg, max_dist)
        else:  # positional tiers: first_last / two_last / first_last_rev
            forms = np.empty(len(sub), dtype=object)
            for i, s_ in enumerate(sub):
                tl = s_.split()
                if len(tl) < 2:
                    forms[i] = None
                elif tier == "two_last":
                    forms[i] = tl[-2] + " " + tl[-1]
                else:
                    # probe form is (first, last) for BOTH first_last and
                    # first_last_rev — the _rev map is keyed on the
                    # registry's (last, first) instead
                    forms[i] = tl[0] + " " + tl[-1]
            got = pd.Series(forms, dtype=object).map(reg[tier])
        got = got.reset_index(drop=True)
        hit = got.notna().to_numpy()
        keys[idx[hit]] = got[hit].to_numpy(dtype=np.int64)
        types[idx[hit]] = tier
        open_[idx[hit]] = False
    return keys, types


# ---- probe construction (deterministic, SQL-restated) -----------------------
# Eight corruption modes keyed by event_id, one per reference noise shape:
# 0 = clean (exact), 1 = token order flipped (tokenset), 2 = leading-char
# typo (lev), 3 = trailing noise token (subset), 4 = unmatchable garbage
# (unknown), 5 = a FOREIGN full name spliced between first and last
# (subset goes ambiguous → first_last), 6 = a REVERSED foreign name
# prefixed (subset ambiguous, forward (first, last) form starts with a
# last-position token → two_last), 7 = last + foreign name + first
# (subset ambiguous, no forward positional form → first_last_rev). The
# foreign-name offsets (+1, +7, +3 on partkey) are arbitrary but pinned.
# The SAME formulas appear in sql_ops.FUZZY_ATTRIBUTION_SQL.
_MODE5_OFF, _MODE6_OFF, _MODE7_OFF = 1, 7, 3


def probe_codes(event_ids: np.ndarray, n_parts: int) -> np.ndarray:
    """Collapse each event to its probe-identity code: modes 0-3 and 5-7
    are a function of (partkey, mode); mode 4 of event_id % GARBAGE_MOD.
    The code space is ≤ 8·n_parts + GARBAGE_MOD, so distinct-probe work
    is bounded by the entity vocabulary, not the corpus."""
    pk = event_ids % n_parts
    mode = event_ids % N_PROBE_MODES
    return np.where(
        mode != 4,
        pk * N_PROBE_MODES + mode,
        N_PROBE_MODES * n_parts + event_ids % GARBAGE_MOD,
    ).astype(np.int64)


def probe_of_code(code: int, part_names: np.ndarray) -> str:
    n_parts = len(part_names)
    if code >= N_PROBE_MODES * n_parts:
        return f"zz{code - N_PROBE_MODES * n_parts}q"
    pk, mode = divmod(code, N_PROBE_MODES)
    nm = part_names[pk]
    tl = nm.split()
    if mode == 0:
        return nm
    if mode == 1:
        return " ".join(tl[::-1])
    if mode == 2:
        return "x" + nm[1:]
    if mode == 3:
        return nm + " deluxe"
    if mode == 5:
        other = part_names[(pk + _MODE5_OFF) % n_parts]
        return tl[0] + " " + other + " " + tl[-1]
    if mode == 6:
        # REVERSED foreign name prefixed: the probe then starts with a
        # last-position token, so the forward (first, last) form misses
        # the registry and the probe falls through to two_last
        other = part_names[(pk + _MODE6_OFF) % n_parts]
        return " ".join(other.split()[::-1]) + " " + nm
    other = part_names[(pk + _MODE7_OFF) % n_parts]
    return tl[-1] + " " + other + " " + tl[0]


def fuzzy_attribute(events_ds, reg_ref,
                    ladder: tuple[str, ...] = DEFAULT_LADDER):
    """Per-turn fuzzy entity attribution: derive each turn's noisy probe
    name, resolve it through the matcher ladder against the broadcast
    registry, and emit (event_id, probe_name, match_key, match_type).
    Batch-local collapse to distinct probe codes means the ladder runs
    once per distinct probe per batch, never once per row."""
    import ray

    def probe(batch: pa.Table) -> pa.Table:
        reg = ray.get(reg_ref)
        part_names = reg["part_names"]
        eids = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = probe_codes(eids, len(part_names))
        ucodes, inv = np.unique(codes, return_inverse=True)
        probes = np.array(
            [probe_of_code(int(c), part_names) for c in ucodes], dtype=object
        )
        keys, types = match_ladder(probes, reg, ladder=ladder)
        return pa.table(
            {
                "event_id": pa.array(eids),
                "probe_name": pa.array(probes[inv], type=pa.string()),
                "match_key": pa.array(keys[inv], type=pa.int64()),
                "match_type": pa.array(types[inv], type=pa.string()),
            }
        )

    return events_ds.map_batches(probe, batch_format="pyarrow")


# ---- blocked similarity self-join -------------------------------------------
FUZZY_TITLE_TOKENS = 4
FUZZY_TITLE_MAX_DIST = 2


def fuzzy_title_pairs(docs_ds, max_dist: int = FUZZY_TITLE_MAX_DIST,
                      n_tokens: int = FUZZY_TITLE_TOKENS,
                      num_partitions: int = 64):
    """Blocked edit-distance similarity SELF-join — the entity-resolution
    shape (dedupe.py / OpenRefine style) the attribution ladder's
    probe-vs-registry form can't express: all (doc_a < doc_b) pairs whose
    derived title keys (first `n_tokens` tokens, space-joined) are within
    `max_dist` byte-level Levenshtein edits.

    Blocking = the standard recall/cost knob, stated explicitly: a pair
    is a candidate iff both keys share their FIRST TOKEN and differ in
    length by <= max_dist (the length filter is lossless for edit
    distance; the first-token block is the deliberately lossy part —
    production ER runs several complementary blocking passes). The SQL
    oracle applies the identical blocking, so the check is exact.

    Plan: one map derives (doc_id, block, key); ONE exchange on block;
    per partition, bucket runs expand to candidate pairs via the
    per-distinct-bucket-size triu pass (the minhash pattern — one Python
    call per partition), then ONE vectorized `lev_pairs` DP verifies all
    candidates at once. Byte-level Levenshtein matches DuckDB's
    `levenshtein()` exactly (it counts bytes for multi-byte chars: probed
    'åä'↔'ab' = 4). Skew: a hot first token of m docs yields m(m-1)/2
    candidates pre-length-filter — salt hot blocks with a second token
    at real scale. Emits (doc_a, doc_b, dist)."""
    from ..tokens import explode
    from .hashagg import map_partitions_by_key, run_pair_indices

    def keys(batch: pa.Table) -> pd.DataFrame:
        rows, toks = explode(batch["text"].combine_chunks())
        ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if len(rows) == 0:
            return pd.DataFrame(
                {"doc_id": np.array([], dtype=np.int64),
                 "block": np.array([], dtype=object),
                 "key": np.array([], dtype=object)}
            )
        pos = np.arange(len(rows)) - np.searchsorted(rows, rows)
        head = pos < n_tokens
        df = pd.DataFrame({"r": rows[head], "tok": toks[head]})
        joined = df.groupby("r", sort=True)["tok"].agg(" ".join)
        r = joined.index.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": ids[r].astype(np.int64),
                "block": df.groupby("r", sort=True)["tok"].first().to_numpy(),
                "key": joined.to_numpy(),
            }
        )

    empty = pd.DataFrame(
        {"doc_a": np.array([], dtype=np.int64),
         "doc_b": np.array([], dtype=np.int64),
         "dist": np.array([], dtype=np.int64)}
    )

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["block", "doc_id"], kind="mergesort").reset_index(
            drop=True
        )
        if len(part) == 0:
            return empty
        blk = part["block"].to_numpy()
        new = np.empty(len(part), dtype=bool)
        new[0] = True
        new[1:] = blk[1:] != blk[:-1]
        ia, ib = run_pair_indices(new)
        if len(ia) == 0:
            return empty
        # vocabulary-bounded encode: one code row per DISTINCT key
        ukeys, inv = np.unique(part["key"].to_numpy(), return_inverse=True)
        klen = np.array([len(k.encode("utf-8")) for k in ukeys], dtype=np.int64)
        la, lb = klen[inv[ia]], klen[inv[ib]]
        keep = np.abs(la - lb) <= max_dist  # lossless length filter
        ia, ib, la, lb = ia[keep], ib[keep], la[keep], lb[keep]
        if len(ia) == 0:
            return empty
        width = int(klen.max())
        codes = _encode(ukeys, width)
        dist = lev_pairs(codes[inv[ia]], la, codes[inv[ib]], lb)
        hit = dist <= max_dist
        ids = part["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "doc_a": ids[ia[hit]].astype(np.int64),
                "doc_b": ids[ib[hit]].astype(np.int64),
                "dist": dist[hit].astype(np.int64),
            }
        )

    return map_partitions_by_key(
        docs_ds.map_batches(keys, batch_format="pyarrow"),
        keys="block",
        fn=pairs_part,
        num_partitions=num_partitions,
    )

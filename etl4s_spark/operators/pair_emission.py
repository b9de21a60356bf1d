"""Capped pair emission for LSH bucket operators — the shared contract
of minhash_lsh_candidates (text) and embedding_neardup_lsh (vectors).

A bucket of g members has g(g−1)/2 candidate pairs; duplicate-heavy
corpora make that Σg² — the one inherently quadratic term in either
funnel. The effective per-bucket budget is
``least(max_pairs_per_bucket, pair_cap_factor·g)`` (whichever knobs are
non-None). Up to r10 an overflowing bucket STAR-collapsed to hub×rest —
component-preserving but only g−1 pairs, i.e. the budget allows ~cap
pairs and the star spends ~g of it: measured full-operator pairwise
emission of a planted cosine-0.95 pair under shipped defaults was 0.209
(EMB_DEFAULT_SCALING r11 `pair_emitted_95`) because a true pair inside
a noisy capped bucket was emitted only via the hub.

r11 replaces the star with HUB-ANCHORED LOCALITY-CHAIN EMISSION:
members arrive sorted by a locality key (the caller's choice — the
operators pass OTHER tables'/bands' signatures, which cost nothing
extra and put similar members adjacent); with c = max(1, ⌊cap/g⌋),
each member pairs with its next c−1 neighbors in that order, and the
bucket hub (first member) additionally pairs with every member beyond
its own window. Properties:

- BUDGET: emitted = (c−1-chain) + (star tail) = c·g − c(c+1)/2 ≤ c·g
  ≤ cap (the star spent g−1 of the same budget). The c=1 connectivity
  floor (cap < 2g) degrades to exactly the pre-r11 pure star — and is
  unreachable under shipped defaults, for a reason OUTSIDE this
  module: both funnels drop buckets over ``max_bucket_size`` (1000)
  before emission, and for kept buckets the effective cap keeps c
  comfortably ≥ 2 — text ``least(10k, 8g)`` gives c=8 at every kept
  g ≤ 1000; embedding ``least(10k, 64g)`` gives c ≥ ⌊10k/1000⌋ = 10.
  Reaching c=1 requires user-set knobs (a small ``max_pairs_per_bucket``
  or a raised ``max_bucket_size``); DEDUP_CAP_PROBE's megagroup lanes
  measure the shipped posture for g > 1000 groups instead (bucket
  dropped ⇒ zero funnel pairs; exact-dedup-first is the designed
  composition for boilerplate mega-groups).
- COMPONENTS + DIAMETER: every member is adjacent to the hub (via its
  chain window or the star tail), so the capped bucket subgraph has
  DIAMETER ≤ 2 — connected components over capped candidate pairs
  equal components over uncapped pairs AND min-label CC converges in
  the same O(small) sweeps it did under the star (a bare chain would
  be component-equal too but diameter-g, blowing min-label's sweep
  budget — caught by test_minhash_pair_cap_bounds_mega_cluster's CC
  check when a chain-only draft ran it). Pinned by that test,
  test_capped_funnel_semantics, and the embedding twin.
- PAIRWISE RECALL: a true pair co-bucketing in a capped bucket is
  emitted iff its rank distance in locality order ≤ c−1 (or it
  involves the hub). Similar members share locality-key prefixes
  (hyperplane bits agree w.p. 1 − angle/π per plane; minhash bands are
  equal w.p. sim^r), so true pairs sort adjacent and the measured
  emission recall jumps vs the hub-only star (see EMB_DEFAULT_SCALING
  recall lanes) — while noise pairs still verify-fail downstream.
  Identical members (the dominant dedup case) have IDENTICAL keys,
  falling back to id order within the duplicate run — any window of
  c−1 covers their nearest run-neighbors.
- DETERMINISM: the id field is the sort tiebreaker; pairs are emitted
  canonically (id_a = least, id_b = greatest), so re-runs and task
  retries produce identical output.

``truncated`` audit semantics are unchanged: per emitted pair, the
largest single-bucket dropped-pair count among its emitting buckets
(0 = no capping seen); capped output remains a flagged LOWER BOUND of
the exhaustive pair set, never a wrong pair.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def locality_chain_combos(
    members: Column,
    max_pairs_per_bucket: int | None,
    pair_cap_factor: int | None,
) -> tuple[Column, Column]:
    """Build the per-bucket pair-emission expressions.

    ``members``: array<struct<..., id>> ALREADY sorted ascending
    (sort_array over struct sorts field-by-field), so array order is
    (locality key, id). The LAST field must be named ``id``; any fields
    before it are locality keys and never read here.

    Returns ``(combos, dropped)``: combos is array<struct<id_a, id_b>>
    with id_a < id_b canonically; dropped is the bucket's dropped-pair
    count (long, 0 when the bucket emitted exhaustively).
    """
    ids = F.transform(members, lambda m: m["id"])
    g_int = F.size(members)
    g = g_int.cast("long")

    def emit(x, y):
        return F.struct(F.least(x, y).alias("id_a"), F.greatest(x, y).alias("id_b"))

    all_combos = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.greatest(g_int - i - 1, F.lit(0))),
                lambda y: emit(x, y),
            ),
        )
    )
    full_pairs = g * (g - F.lit(1)) / F.lit(2)  # double, exact ≤ 2^52
    cap_terms = []
    if max_pairs_per_bucket is not None:
        cap_terms.append(F.lit(float(max_pairs_per_bucket)))
    if pair_cap_factor is not None:
        cap_terms.append(F.lit(float(pair_cap_factor)) * g)
    if not cap_terms:
        return all_combos, F.lit(0).cast("long")

    cap_eff = cap_terms[0] if len(cap_terms) == 1 else F.least(*cap_terms)
    overflow = full_pairs > cap_eff
    c = F.greatest(F.lit(1), F.floor(cap_eff / g).cast("int"))
    w = c - F.lit(1)  # locality window; c=1 floor degrades to pure star
    chain = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(
                    ids,
                    i + 2,
                    F.greatest(F.least(w, g_int - i - 1), F.lit(0)),
                ),
                lambda y: emit(x, y),
            ),
        )
    )
    hub = F.element_at(ids, 1)
    star_tail = F.transform(
        F.slice(ids, w + 2, F.greatest(g_int - w - 1, F.lit(0))),
        lambda y: emit(hub, y),
    )
    cl = c.cast("long")
    # chain-(c−1) + hub×(g−1−(c−1)) collapses to the same closed form
    emitted = cl * g - cl * (cl + F.lit(1)) / F.lit(2)  # double, exact
    combos = F.when(overflow, F.concat(chain, star_tail)).otherwise(all_combos)
    dropped = F.when(overflow, (full_pairs - emitted).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    return combos, dropped

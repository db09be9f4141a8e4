"""Property test: chunk-banded Hamming pair generation is EXACT — for
any signature multiset, any width, and any (chunks, max_hamming) with
chunks > max_hamming, ``hamming_banded_pairs`` returns precisely the
brute-force pair set (the pigeonhole recall argument, round 9: the
machinery now backs both SimHash text dedup and perceptual-hash image
dedup, so its recall is load-bearing twice)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def _sig_case(draw):
    bits = draw(st.sampled_from([16, 32, 64]))
    chunks = draw(st.sampled_from([4, 8]))
    max_hamming = draw(st.integers(min_value=0, max_value=chunks - 1))
    n = draw(st.integers(min_value=2, max_value=24))
    # cluster-ish signatures: a few random bases, members flip a few bits
    # (pure-uniform draws almost never land within max_hamming, which
    # would leave the recall claim untested)
    bases = draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << bits) - 1),
            min_size=1, max_size=4,
        )
    )
    sigs = []
    for i in range(n):
        base = bases[i % len(bases)]
        flips = draw(st.integers(min_value=0, max_value=max_hamming + 1))
        v = base
        for _ in range(flips):
            v ^= 1 << draw(st.integers(min_value=0, max_value=bits - 1))
        sigs.append(v)
    return bits, chunks, max_hamming, sigs


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_sig_case())
def test_banded_pairs_equal_brute_force(spark, case):
    from paimon_presto_spark.operators.dedup import hamming_banded_pairs

    bits, chunks, max_hamming, raw = case
    # store as the signed 64-bit value Spark's bigint carries (sign-safe
    # banding is part of the contract for full-width signatures)
    rows = [(i, _to_signed64(v) if bits == 64 else v)
            for i, v in enumerate(raw)]
    df = spark.createDataFrame(rows, "doc_id bigint, sig bigint")
    mask = (1 << bits) - 1
    brute = {}
    for i, a in rows:
        for j, b in rows:
            if i < j:
                hm = bin((a ^ b) & mask).count("1")
                if hm <= max_hamming:
                    brute[(i, j)] = hm
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_banded_pairs(
            df, sig_col="sig", bits=bits,
            max_hamming=max_hamming, chunks=chunks,
        ).collect()
    }
    assert got == brute


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    case=_sig_case(),
    mode=st.sampled_from(["thirds", "all_new", "all_old"]),
)
def test_incremental_banded_pairs_equal_restricted_full(spark, case, mode):
    """The incremental generator must equal the FULL generator over
    old ∪ new restricted to pairs touching >= 1 new id — for any
    signature multiset and any split, INCLUDING both empty-side edges:
    an empty old side is the first-ever ingest (every pair is new-new)
    and an empty new side is a no-arrivals day (the result must be
    empty, whatever the stored corpus holds). Round 11: the incremental
    rung completes the store-and-reuse family for perceptual dedup; a
    review pass found the original i%3 split could never produce an
    empty side, leaving the first-ingest path untested."""
    from paimon_presto_spark.operators.dedup import (
        hamming_banded_pairs,
        hamming_banded_pairs_incremental,
    )

    bits, chunks, max_hamming, raw = case
    rows = [(i, _to_signed64(v) if bits == 64 else v)
            for i, v in enumerate(raw)]
    if mode == "all_new":
        new_rows, old_rows = rows, []
    elif mode == "all_old":
        new_rows, old_rows = [], rows
    else:
        new_rows = [r for r in rows if r[0] % 3 == 0]
        old_rows = [r for r in rows if r[0] % 3 != 0]
    schema = "doc_id bigint, sig bigint"
    full = hamming_banded_pairs(
        spark.createDataFrame(rows, schema), sig_col="sig",
        bits=bits, max_hamming=max_hamming, chunks=chunks,
    ).collect()
    new_ids = {r[0] for r in new_rows}
    expected = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in full
        if r["doc_a"] in new_ids or r["doc_b"] in new_ids
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_banded_pairs_incremental(
            spark.createDataFrame(new_rows, schema),
            spark.createDataFrame(old_rows, schema),  # may be empty
            sig_col="sig", bits=bits,
            max_hamming=max_hamming, chunks=chunks,
        ).collect()
    }
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_sig_case())
def test_collapse_identical_pairs_contract(spark, case):
    """The skew rung's output contract, pinned exactly: star edges
    (class min-id representative -> member, Hamming 0) plus the full
    generator's pairs over one representative per DISTINCT signature —
    and that edge set must induce THE SAME connected components as the
    full pairwise enumeration (the property keep-best consumers rely
    on). The _sig_case generator draws flips=0 members, so duplicate
    signatures (the skew case) occur in most examples."""
    from paimon_presto_spark.operators.dedup import hamming_banded_pairs

    bits, chunks, max_hamming, raw = case
    rows = [(i, _to_signed64(v) if bits == 64 else v)
            for i, v in enumerate(raw)]
    df = spark.createDataFrame(rows, "doc_id bigint, sig bigint")
    mask = (1 << bits) - 1

    # expected: star edges + brute-force pairs over class representatives
    rep = {}
    for i, v in rows:
        if v not in rep or i < rep[v]:
            rep[v] = i
    expected = {
        (rep[v], i, 0) for i, v in rows if i != rep[v]
    }
    reps = sorted(rep.items(), key=lambda kv: kv[1])
    for vi, i in reps:
        for vj, j in reps:
            if i < j:
                hm = bin((vi ^ vj) & mask).count("1")
                if hm <= max_hamming:
                    expected.add((i, j, hm))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hamming_banded_pairs(
            df, sig_col="sig", bits=bits, max_hamming=max_hamming,
            chunks=chunks, collapse_identical=True,
        ).collect()
    }
    assert got == expected

    # component equivalence vs the full enumeration (pure-python DSU)
    def components(pairs):
        parent = {i: i for i, _ in rows}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        return {i: find(i) for i, _ in rows}

    full_pairs = [
        (i, j)
        for i, a in rows
        for j, b in rows
        if i < j and bin((a ^ b) & mask).count("1") <= max_hamming
    ]
    comp_full = components(full_pairs)
    comp_collapsed = components([(a, b) for a, b, _ in got])
    group = lambda comp: sorted(
        tuple(sorted(i for i in comp if comp[i] == r))
        for r in set(comp.values())
    )
    assert group(comp_full) == group(comp_collapsed)


def test_collapse_identical_is_linear_in_class_size(spark):
    """k identical signatures must yield exactly k-1 star edges, not
    k(k-1)/2 pairwise edges — the whole point of the skew rung (a blank
    frame repeated across a 100 TB corpus turns every one of its chunk
    buckets quadratic in the default mode, and no banding width can
    split equal chunks)."""
    from paimon_presto_spark.operators.dedup import hamming_banded_pairs

    k = 40
    blank = [(i, 0) for i in range(k)]                    # one huge class
    distinct = [(100 + i, (1 << 32) + (i << 13)) for i in range(5)]
    df = spark.createDataFrame(
        blank + distinct, "doc_id bigint, sig bigint"
    )
    got = hamming_banded_pairs(
        df, sig_col="sig", bits=64, max_hamming=3, chunks=8,
        collapse_identical=True,
    ).collect()
    star = [r for r in got if r["hamming"] == 0]
    assert len(star) == k - 1
    assert all(r["doc_a"] == 0 for r in star)             # min-id rep
    full = hamming_banded_pairs(
        df, sig_col="sig", bits=64, max_hamming=3, chunks=8,
    ).collect()
    assert len([r for r in full if r["hamming"] == 0]) == k * (k - 1) // 2


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    case=_sig_case(),
    mode=st.sampled_from(["thirds", "all_new", "all_old"]),
)
def test_incremental_collapse_composes_with_prior_pass(spark, case, mode):
    """The incremental skew rung's contract is COMPOSITIONAL: the edges
    it emits, unioned with the edge set yesterday's collapsed full pass
    already materialized over the old corpus, must induce exactly the
    connected components the full pairwise enumeration induces over
    old ∪ new — for any multiset and any split, including both
    empty-side edges. (A class spanning old and new must connect
    through the Hamming-0 rep-to-rep pair; a new class must reach every
    old class within max_hamming through one witness edge.)"""
    from paimon_presto_spark.operators.dedup import (
        hamming_banded_pairs,
        hamming_banded_pairs_incremental,
    )

    bits, chunks, max_hamming, raw = case
    rows = [(i, _to_signed64(v) if bits == 64 else v)
            for i, v in enumerate(raw)]
    if mode == "all_new":
        new_rows, old_rows = rows, []
    elif mode == "all_old":
        new_rows, old_rows = [], rows
    else:
        new_rows = [r for r in rows if r[0] % 3 == 0]
        old_rows = [r for r in rows if r[0] % 3 != 0]
    schema = "doc_id bigint, sig bigint"
    mask = (1 << bits) - 1

    prev_edges = [
        (r["doc_a"], r["doc_b"])
        for r in hamming_banded_pairs(
            spark.createDataFrame(old_rows, schema), sig_col="sig",
            bits=bits, max_hamming=max_hamming, chunks=chunks,
            collapse_identical=True,
        ).collect()
    ]
    incr_edges = [
        (r["doc_a"], r["doc_b"])
        for r in hamming_banded_pairs_incremental(
            spark.createDataFrame(new_rows, schema),
            spark.createDataFrame(old_rows, schema),
            sig_col="sig", bits=bits,
            max_hamming=max_hamming, chunks=chunks,
            collapse_identical=True,
        ).collect()
    ]

    def components(pairs):
        parent = {i: i for i, _ in rows}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp = {i: find(i) for i, _ in rows}
        return sorted(
            tuple(sorted(i for i in comp if comp[i] == r))
            for r in set(comp.values())
        )

    full_pairs = [
        (i, j)
        for i, a in rows
        for j, b in rows
        if i < j and bin((a ^ b) & mask).count("1") <= max_hamming
    ]
    assert components(prev_edges + incr_edges) == components(full_pairs)

    # witness guarantee: every new doc with ANY qualifying partner in
    # old ∪ smaller-or-larger new must appear in >= 1 incremental edge
    # OR be its class rep reachable via a rep-level edge — admit/drop
    # consumers group by component, so component membership is the
    # operative check (asserted above); here we pin the cheaper local
    # fact that a new doc in a multi-member class is never edge-less
    new_ids = {r[0] for r in new_rows}
    sig_of = dict(rows)
    class_sizes = {}
    for i, v in rows:
        class_sizes[v] = class_sizes.get(v, 0) + 1
    touched = {d for e in incr_edges for d in e}
    for i in sorted(new_ids):
        if class_sizes[sig_of[i]] > 1:
            assert i in touched or any(
                i in (a, b) for a, b in prev_edges
            ), f"new doc {i} in a multi-member class has no edge"


def test_incremental_collapse_is_linear_against_degenerate_old_class(spark):
    """1,000 old blanks + 3 new blanks: exact mode emits 3 edges per old
    blank plus the new-new pairs (3,003); collapse emits 2 star edges +
    1 rep-to-rep witness = 3. The 10⁸-blank-corpus case from the
    docstring, shrunk to test scale."""
    from paimon_presto_spark.operators.dedup import (
        hamming_banded_pairs_incremental,
    )

    old = [(i, 0) for i in range(1000)]
    new = [(5000 + i, 0) for i in range(3)]
    schema = "doc_id bigint, sig bigint"
    exact = hamming_banded_pairs_incremental(
        spark.createDataFrame(new, schema),
        spark.createDataFrame(old, schema),
        sig_col="sig", bits=64, max_hamming=3, chunks=8,
    ).count()
    assert exact == 3 * 1000 + 3
    collapsed = hamming_banded_pairs_incremental(
        spark.createDataFrame(new, schema),
        spark.createDataFrame(old, schema),
        sig_col="sig", bits=64, max_hamming=3, chunks=8,
        collapse_identical=True,
    ).collect()
    assert len(collapsed) == 3
    assert sorted(
        (r["doc_a"], r["doc_b"], r["hamming"]) for r in collapsed
    ) == [(0, 5000, 0), (5000, 5001, 0), (5000, 5002, 0)]


def test_simhash_pairs_collapse_passthrough(spark):
    """simhash_pairs must actually forward collapse_identical — two
    byte-identical documents (one SimHash class) yield a single
    Hamming-0 star edge in collapse mode, same pair set as exact mode
    here, but via the class-collapse path (three identical docs give 2
    star edges, not 3 pairwise edges — the distinguishing count)."""
    from paimon_presto_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(i, "the exact same boilerplate text repeated") for i in range(3)]
        + [(10, "a completely different document about spark banding")],
        "doc_id bigint, text string",
    )
    collapsed = simhash_pairs(
        docs, bits=32, max_hamming=2, chunks=4, collapse_identical=True
    ).collect()
    zero = sorted(
        (r["doc_a"], r["doc_b"]) for r in collapsed if r["hamming"] == 0
    )
    assert zero == [(0, 1), (0, 2)]  # 2 star edges off the min-id rep
    exact_zero = [
        r
        for r in simhash_pairs(
            docs, bits=32, max_hamming=2, chunks=4
        ).collect()
        if r["hamming"] == 0
    ]
    assert len(exact_zero) == 3  # the pairwise enumeration: C(3,2)

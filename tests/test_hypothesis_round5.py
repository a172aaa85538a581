"""Property-based tests for round-5 operators vs pure-Python references
over generated inputs: connected components vs union-find, incremental
merge vs recompute, PNG codec roundtrip under arbitrary pixel content and
adversarial (per-row varied) filter choices."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

_SETTINGS = settings(max_examples=15, deadline=None)
# Spark-action-heavy properties (iterative CC runs several jobs per
# example) get fewer examples — the pure-Python PNG properties keep 15
_SPARK_SETTINGS = settings(max_examples=5, deadline=None)


# ---------------------------------------------------------------------------
# connected components vs union-find
# ---------------------------------------------------------------------------

EDGES = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=1,
    max_size=60,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min member of each component
    comp: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp[n] = min(comp.get(r, r), r)
    return {n: find(n) for n in parent}


@given(EDGES)
@_SPARK_SETTINGS
def test_cc_matches_union_find(spark, edges):
    from bioeco_portal_etl_spark.graph.cc import connected_components

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find(edges)


# ---------------------------------------------------------------------------
# incremental merge == recompute, for ANY base/delta partition of the rows
# ---------------------------------------------------------------------------

ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.one_of(
            st.none(),
            st.decimals(
                min_value=-10**6,
                max_value=10**6,
                places=4,
                allow_nan=False,
                allow_infinity=False,
            ).map(float),
        ),
    ),
    min_size=1,
    max_size=25,
)


@given(ROWS, st.integers(0, 24))
@_SPARK_SETTINGS
def test_merge_equals_recompute_any_split(spark, rows, cut):
    from bioeco_portal_etl_spark.operators.incremental import (
        merge_aggs,
        partial_agg,
    )

    cut = min(cut, len(rows))
    schema = "k string, v double"
    base = spark.createDataFrame(rows[:cut] or [("zz", None)], schema)
    delta = spark.createDataFrame(rows[cut:] or [("zz", None)], schema)
    padded = (rows[:cut] or [("zz", None)]) + (rows[cut:] or [("zz", None)])
    merged = {
        r.k: (r.n_rows, r.sum_val, r.min_val, r.max_val)
        for r in merge_aggs(
            partial_agg(base, ["k"], "v"),
            partial_agg(delta, ["k"], "v"),
            ["k"],
        ).collect()
    }
    recomputed = {
        r.k: (r.n_rows, r.sum_val, r.min_val, r.max_val)
        for r in partial_agg(
            spark.createDataFrame(padded, schema), ["k"], "v"
        ).collect()
    }
    assert merged == recomputed  # Decimal equality — no ulp slack


# ---------------------------------------------------------------------------
# PNG roundtrip under arbitrary pixels and per-row filter choices
# ---------------------------------------------------------------------------

IMAGE = st.integers(1, 9).flatmap(
    lambda w: st.integers(1, 6).flatmap(
        lambda h: st.tuples(
            st.just(w),
            st.just(h),
            st.sampled_from([1, 3, 4]),
        ).flatmap(
            lambda whc: st.lists(
                st.lists(
                    st.integers(0, 255),
                    min_size=whc[0] * whc[2],
                    max_size=whc[0] * whc[2],
                ),
                min_size=whc[1],
                max_size=whc[1],
            ).map(lambda rows: (whc[0], whc[1], whc[2], rows))
        )
    )
)


@given(IMAGE)
@_SETTINGS
def test_png_encode_decode_identity(img):
    from bioeco_portal_etl_spark.multimodal.png import decode_png, encode_png

    w, h, ch, rows = img
    assert decode_png(encode_png(rows, channels=ch)) == (w, h, ch, rows)


@given(IMAGE, st.lists(st.integers(0, 4), min_size=6, max_size=6))
@_SETTINGS
def test_png_decode_reconstructs_any_filter_sequence(img, ftypes):
    """Forward-filter each scanline with an arbitrary filter type, then
    require bit-exact reconstruction — covers filter interactions (e.g.
    Paeth after Average) a fixed cycling pattern can miss."""
    import struct
    import zlib

    from bioeco_portal_etl_spark.multimodal.png import (
        _chunk,
        _paeth,
        _SIGNATURE,
        decode_png,
    )

    w, h, ch, rows = img
    stride, bpp = w * ch, ch
    raw = bytearray()
    prev = bytes(stride)
    for y, r in enumerate(rows):
        ftype = ftypes[y % len(ftypes)]
        line = bytes(r)
        raw.append(ftype)
        for i in range(stride):
            a = line[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                raw.append(line[i])
            elif ftype == 1:
                raw.append((line[i] - a) & 0xFF)
            elif ftype == 2:
                raw.append((line[i] - b) & 0xFF)
            elif ftype == 3:
                raw.append((line[i] - ((a + b) >> 1)) & 0xFF)
            else:
                raw.append((line[i] - _paeth(a, b, c)) & 0xFF)
        prev = line
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    payload = (
        _SIGNATURE
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (w, h, ch, rows)


# ---------------------------------------------------------------------------
# split leakage: flagged hashes are exactly the cross-split content groups
# ---------------------------------------------------------------------------

LEAK_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["t1", "t2", "t3", "t4"]),  # content pool (collisions likely)
        st.sampled_from(["train", "val"]),
    ),
    min_size=1,
    max_size=20,
)


@given(LEAK_ROWS)
@_SPARK_SETTINGS
def test_leakage_flags_exactly_cross_split_groups(spark, rows):
    from bioeco_portal_etl_spark.operators.leakage import split_leakage

    data = [(i, t, s) for i, (t, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, text string, split string")
    got = {
        r.content_hash: (r.n_docs, r.n_train, r.n_eval, r.min_doc)
        for r in split_leakage(df, "doc_id", "text", "split").collect()
    }
    # pure-Python reference
    import hashlib

    groups: dict[str, list[tuple[int, str]]] = {}
    for i, (t, s) in enumerate(rows):
        groups.setdefault(hashlib.md5(t.encode()).hexdigest(), []).append((i, s))
    exp = {}
    for hsh, members in groups.items():
        ntr = sum(1 for _, s in members if s == "train")
        nev = len(members) - ntr
        if ntr > 0 and nev > 0:
            exp[hsh] = (len(members), ntr, nev, min(i for i, _ in members))
    assert got == exp

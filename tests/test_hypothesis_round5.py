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


# ---------------------------------------------------------------------------
# WAV codec roundtrip on arbitrary sample streams
# ---------------------------------------------------------------------------

SAMPLES = st.lists(st.integers(-32768, 32767), min_size=0, max_size=400)


@given(SAMPLES)
@_SETTINGS
def test_wav_roundtrip_any_samples(samples):
    from bioeco_portal_etl_spark.multimodal.wavpcm import (
        decode_wav,
        encode_wav,
    )

    _, back = decode_wav(encode_wav(samples))
    assert back == samples


# ---------------------------------------------------------------------------
# SCD2 history: versions tile the timeline, per-key, for ANY change log
# ---------------------------------------------------------------------------

LOG = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                  # key
        st.one_of(st.none(), st.sampled_from("xyz")),  # value (nullable)
        st.integers(0, 20),                            # ts (ties allowed)
    ),
    min_size=1,
    max_size=25,
)


@given(LOG)
@_SPARK_SETTINGS
def test_scd2_versions_tile_timeline(spark, log):
    from bioeco_portal_etl_spark.operators.scd import scd2_history

    rows = [(k, v, ts, i) for i, (k, v, ts) in enumerate(log)]
    df = spark.createDataFrame(rows, "k string, v string, ts long, id long")
    got = scd2_history(df, ["k"], "v", ["ts", "id"], ts_col="ts").collect()

    by_key: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r.k, r.version)):
        by_key.setdefault(r.k, []).append(r)
    # reference: walk the log in (ts, id) order per key
    ref: dict[str, list] = {}
    for k, v, ts, i in sorted(rows, key=lambda t: (t[2], t[3])):
        seq = ref.setdefault(k, [])
        # Python != is already null-safe (None != None -> False)
        if not seq or seq[-1][0] != v:
            seq.append((v, ts))
    for k, versions in by_key.items():
        expect = ref[k]
        assert [(r.v, r.valid_from) for r in versions] == expect
        # intervals tile: valid_to == next valid_from; exactly one open row
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from and a.is_current == 0
        assert versions[-1].valid_to is None
        assert versions[-1].is_current == 1
        assert [r.version for r in versions] == list(
            range(1, len(versions) + 1)
        )
    assert set(by_key) == set(ref)


# ---------------------------------------------------------------------------
# winnowing: the SWA guarantee on random docs with a shared passage
# ---------------------------------------------------------------------------

ALPHA = "abcd "


@given(
    st.text(ALPHA, min_size=0, max_size=30),
    st.text(ALPHA, min_size=0, max_size=30),
    st.text(ALPHA, min_size=8, max_size=20),  # shared, len >= k + w - 1
)
@_SPARK_SETTINGS
def test_winnow_guarantee_property(spark, pre, post, shared):
    from bioeco_portal_etl_spark.text.winnow import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, pre + shared + "!!"), (2, "##" + shared + post)],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df, "doc_id", "text", k=5, w=4).collect()
    fps1 = {r.fp for r in rows if r.doc_id == 1}
    fps2 = {r.fp for r in rows if r.doc_id == 2}
    assert fps1 & fps2, "shared substring of length >= w+k-1 must share a fingerprint"

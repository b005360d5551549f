"""Property-based tests (hypothesis) for the expression libraries.

Each property evaluates a whole batch of generated inputs in ONE Spark job
(a list strategy → one DataFrame) so hypothesis shrinks over data, not over
Spark round-trips.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_drone_sense_spark.config import ConfigError, Environment
from etl_drone_sense_spark.functions.geodesy import bearing_deg, haversine_m
from etl_drone_sense_spark.functions.vectors import cosine
from etl_drone_sense_spark.operators.dedup import minhash_from_hashes
from etl_drone_sense_spark.functions import text as TXT

lat = st.floats(-89.0, 89.0, allow_nan=False, width=64)
lon = st.floats(-179.0, 179.0, allow_nan=False, width=64)
coord_pairs = st.lists(st.tuples(lat, lon, lat, lon), min_size=1, max_size=50)


def _py_bearing(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dl = math.radians(lon2 - lon1)
    y = math.sin(dl) * math.cos(p2)
    x = math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl)
    return (math.degrees(math.atan2(y, x)) + 360) % 360


@settings(max_examples=10, deadline=None)
@given(coord_pairs)
def test_geodesy_properties(spark, pairs):
    df = spark.createDataFrame(
        pairs, schema="lat1 double, lon1 double, lat2 double, lon2 double"
    )
    rows = df.select(
        "lat1", "lon1", "lat2", "lon2",
        bearing_deg(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("b"),
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d"),
        haversine_m(F.col("lat2"), F.col("lon2"), F.col("lat1"), F.col("lon1")).alias("d_rev"),
        haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat1"), F.col("lon1")).alias("d_self"),
    ).collect()
    half_circumference = math.pi * 6371000.0
    for r in rows:
        assert 0.0 <= r["b"] < 360.0
        assert 0.0 <= r["d"] <= half_circumference * (1 + 1e-9)
        assert abs(r["d"] - r["d_rev"]) <= 1e-6 * max(r["d"], 1.0)  # symmetry
        assert r["d_self"] == 0.0
        expected = _py_bearing(r["lat1"], r["lon1"], r["lat2"], r["lon2"])
        assert math.isclose(r["b"], expected, rel_tol=0, abs_tol=1e-6) or (
            # 0/360 wraparound: both encode "due north"
            min(r["b"], expected) < 1e-6 and max(r["b"], expected) > 360 - 1e-6
        )


texts = st.lists(
    st.text(
        alphabet=st.sampled_from("abcdefg XYZ0123.,"), min_size=0, max_size=80
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None)
@given(texts)
def test_minhash_signature_properties(spark, docs):
    """Signatures: fixed length k, components in [0, P), identical texts →
    identical signatures (the property dedup correctness rests on)."""
    k = 8
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)], "id long, text string")
    rows = df.select(
        "text",
        minhash_from_hashes(TXT.shingle_hashes(F.col("text"), 2), k).alias("sig"),
    ).collect()
    by_text = {}
    for r in rows:
        assert len(r["sig"]) == k
        assert all(0 <= c < TXT.MINHASH_P for c in r["sig"])
        if r["text"] in by_text:
            assert by_text[r["text"]] == r["sig"]
        by_text[r["text"]] = r["sig"]


vectors = st.lists(
    st.lists(
        st.floats(-5.0, 5.0, allow_nan=False, width=32), min_size=4, max_size=4
    ).filter(lambda v: sum(abs(x) for x in v) > 1e-3),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(vectors)
def test_cosine_properties(spark, vecs):
    df = spark.createDataFrame([(v,) for v in vecs], "v array<float>")
    rows = df.select(
        cosine(F.col("v"), F.col("v")).alias("self_sim"),
        cosine(F.col("v"), F.transform(F.col("v"), lambda x: -x)).alias("anti_sim"),
    ).collect()
    for r in rows:
        assert math.isclose(r["self_sim"], 1.0, abs_tol=1e-9)
        assert math.isclose(r["anti_sim"], -1.0, abs_tol=1e-9)


# --- config contract (no Spark) --------------------------------------------


def test_environment_defaults_and_parsing():
    assert Environment.from_env({}) == Environment(DroneSenseToken="", DEBUG=False)
    e = Environment.from_env({"DroneSenseToken": "tok", "DEBUG": "true"})
    assert e.DroneSenseToken == "tok" and e.DEBUG is True
    assert Environment.from_env({"DEBUG": "0"}).DEBUG is False


def test_environment_rejects_bad_bool():
    import pytest

    with pytest.raises(ConfigError):
        Environment.from_env({"DEBUG": "maybe"})


# --- corpus operator edge cases ---------------------------------------------


def test_chunking_edges(spark):
    """Short/empty docs chunk into exactly one (possibly short) window;
    long docs produce the expected start grid with the overlap carried."""
    from etl_drone_sense_spark.operators.corpus import chunk_documents

    long_text = " ".join(f"w{i}" for i in range(95))
    df = spark.createDataFrame(
        [(1, ""), (2, "one two"), (3, long_text)], "doc_id long, text string"
    )
    rows = chunk_documents(df, chunk_tokens=50, overlap=10).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 1  # "" → 1 token
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "one two"
    # 95 tokens, window 50, step 40 → starts 1, 41, 81
    chunks3 = sorted(by_doc[3], key=lambda r: r["chunk_idx"])
    assert [c["n_tokens"] for c in chunks3] == [50, 50, 15]
    assert chunks3[1]["chunk_text"].split(" ")[0] == "w40"  # overlap of 10


def test_split_assignment_is_stable_and_complete(spark):
    from etl_drone_sense_spark.operators.corpus import assign_split

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in assign_split(df, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in assign_split(df.repartition(7), "doc_id").collect()
    }
    assert a == b  # partitioning-independent
    frac_train = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.7 < frac_train < 0.9
    assert set(a.values()) == {"train", "val", "test"}


def test_langid_predicts_seeds_and_held_out(spark):
    """The n-gram-profile classifier must identify every seeded sentence
    AND a held-out sentence per language it never saw (all 18 languages);
    signal-free text is 'und'."""
    from etl_drone_sense_spark.functions.text import LANGS, langid_predict
    from etl_drone_sense_spark.plans.extensions import LANGID_SEEDS

    held_out = [
        ("da", "jeg ved ikke hvor hun er men det er også sent og vi skal "
               "til byen af mange grunde"),
        ("de", "das haus ist alt und der garten ist nicht klein"),
        ("en", "this is the story of the people that lived for the sea"),
        ("es", "el mercado tiene frutas muy frescas para los clientes y son "
               "baratas con todo"),
        ("fi", "hän sanoi että tämä ei ole helppoa mutta me yritämme myös "
               "huomenna ja kaikki tulevat kanssa"),
        ("fr", "nous marchons dans les rues avec des amis du quartier pour "
               "une heure"),
        ("id", "dia mengatakan bahwa ini adalah hal yang baik dan mereka "
               "tidak akan pergi untuk itu dengan cepat"),
        ("it", "il ragazzo che abita qui non va per la strada perché sono "
               "anche giorni della festa di paese"),
        ("ja", "わたしたちはこの町のことが好きですそして毎日たくさんのことをしました"),
        ("nl", "ik denk dat het niet goed is maar een man van de stad zei "
               "dat wij voor morgen komen"),
        ("pl", "on nie wie jak to się stało ale to jest już bardzo ważne i "
               "musimy być razem"),
        ("pt", "ele não sabe como isso aconteceu mas também acha que uma "
               "coisa é muito boa para nós e são dias bons"),
        ("ro", "el a spus că este bine dar nu știm pentru care din aceste "
               "lucruri să mergem și acest drum e lung"),
        ("ru", "он сказал что это не так и мы будем на месте как всегда"),
        ("sv", "hon sa att det inte är ett problem som vi har när vi kommer "
               "från staden och huset"),
        ("tr", "o bir şey söyledi ama bunun için çok daha iyi bir yol değil "
               "gibi görünüyor ve ben de geldim"),
        ("vi", "anh ấy nói rằng đây không phải là một điều tốt và mọi người "
               "có thể được giúp trong nhà của chúng ta"),
        ("zh", "他们在城市里工作了很多年我的家人也在那里"),
        ("und", "lorem ipsum dolor sit amet consectetur"),
        ("und", ""),
    ]
    # Coverage guards: every profiled language has a seed and a held-out.
    assert {lang for lang, _ in held_out} - {"und"} == set(LANGS)
    assert {lang for lang, _ in LANGID_SEEDS} == set(LANGS)

    rows = list(LANGID_SEEDS) + held_out
    df = spark.createDataFrame(rows, "lang string, text string")
    out = df.select("lang", langid_predict(F.col("text")).alias("p")).collect()
    wrong = [(r["lang"], r["p"]) for r in out if r["lang"] != r["p"]]
    assert not wrong, wrong


def test_incremental_dedup_equals_restricted_full_pairs(spark, sf_dir):
    """Incremental LSH must find exactly the full run's pairs that touch a
    new-batch doc — no pair lost by restricting the probe side, none
    invented."""
    from etl_drone_sense_spark.plans.extensions import (
        dedup_incremental,
        dedup_minhash,
    )

    full = {
        frozenset((r["id_a"], r["id_b"]))
        for r in dedup_minhash(spark, sf_dir).collect()
        if r["id_a"] % 4 == 0 or r["id_b"] % 4 == 0
    }
    inc_rows = dedup_incremental(spark, sf_dir).collect()
    inc = {frozenset((r["id_new"], r["id_other"])) for r in inc_rows}
    assert inc == full
    assert all(r["id_new"] % 4 == 0 for r in inc_rows)
    assert all(
        (r["id_other"] % 4 != 0) == r["vs_corpus"] for r in inc_rows
    )


# --- r8 codec properties (pure-python, no Spark job needed) ----------------

_img_dims = st.tuples(st.integers(1, 25), st.integers(1, 25))


@settings(max_examples=15, deadline=None)
@given(
    _img_dims,
    st.integers(0, 2**32 - 1),
    st.sampled_from(["4:4:4", "4:2:0"]),
)
def test_jpeg_color_roundtrip_bounded_error(dims, seed, subsampling):
    """Any RGB image round-trips through the baseline JPEG codec with
    bounded per-pixel error — arbitrary dims (MCU padding/crop), both
    subsampling layouts. The bound is generous (JPEG is lossy and the
    std tables quantize hard on noise) but must HOLD: an unbounded
    error means a zigzag/dequant/IDCT defect, not loss."""
    import numpy as np

    from etl_drone_sense_spark.operators.multimodal import (
        encode_jpeg,
        parse_jpeg,
    )

    w, h = dims
    rng = np.random.default_rng(seed)
    # smooth low-frequency content: JPEG's own domain (white noise is
    # the adversarial case where std-table loss is unbounded-ish)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        120
        + 60 * np.sin(xx / 6 + seed % 7)
        + 50 * np.cos(yy / 5 + seed % 5)
    )
    rgb = np.stack(
        [base, np.roll(base, 1, 0), np.roll(base, 1, 1)], axis=-1
    ).clip(0, 255).astype(np.uint8)
    pay = encode_jpeg(w, h, rgb.tobytes(), subsampling=subsampling)
    w2, h2, raster = parse_jpeg(pay)
    assert (w2, h2) == (w, h)
    dec = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    # Two bounds, each sized by what a DEFECT (not loss) looks like:
    # * per-pixel: std-table ringing at the roll-seam discontinuity
    #   legitimately reaches ~105 at 4:2:0 (measured sweep) — a
    #   scrambled zigzag/huffman/IDCT hits the 255 rail;
    # * channel-mean drift: DC quantization + edge padding + clip
    #   asymmetry measured ≤ 8.3 — a defect scrambles means by tens to
    #   hundreds. The mean bound is the sharp one.
    err = np.abs(dec.astype(int) - rgb.astype(int)).max()
    assert err <= 128, err
    drift = np.abs(
        dec.reshape(-1, 3).mean(0) - rgb.reshape(-1, 3).mean(0)
    ).max()
    assert drift <= 12.0, drift


@settings(max_examples=15, deadline=None)
@given(
    st.integers(1, 3),
    st.integers(1, 3),
    st.lists(st.integers(-40, 40), min_size=1, max_size=9),
)
def test_jpeg_constant_even_blocks_always_exact(wb, hb, ks):
    """The oracle-bearing exactness property, generalized: ANY grayscale
    image of constant 8x8 blocks with even offsets from 128 decodes
    bit-exactly (DC-only, exactly-representable under q0=16)."""
    import numpy as np

    from etl_drone_sense_spark.operators.multimodal import (
        encode_jpeg,
        parse_jpeg,
    )

    w, h = 8 * wb, 8 * hb
    img = np.empty((h, w), dtype=np.uint8)
    for bi in range(wb * hb):
        by, bx = divmod(bi, wb)
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
            128 + 2 * ks[bi % len(ks)]
        )
    _, _, raster = parse_jpeg(encode_jpeg(w, h, img.tobytes(), ncomp=1))
    dec = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    assert (dec == img[..., None]).all()


_avro_rows = st.lists(
    st.tuples(
        st.integers(-(2**62), 2**62),
        st.one_of(st.none(), st.text(max_size=20)),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    min_size=0,
    max_size=120,
)


@settings(max_examples=12, deadline=None)
@given(_avro_rows, st.sampled_from(["null", "deflate", "snappy", "zstandard"]), st.integers(1, 50))
def test_avrolite_codec_roundtrip_property(tmp_path_factory, rows, codec, block):
    """Any (long, nullable string, double) relation round-trips through
    every supported codec at any block size — including empty relations
    and block-boundary-straddling ones."""
    from etl_drone_sense_spark.sources import avrolite as AL

    d = tmp_path_factory.mktemp("avro_prop")
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "x", "type": "double"},
        ],
    }
    p = str(d / f"t_{codec}.avro")
    AL.write_avro(
        p,
        schema,
        ({"k": k, "s": s, "x": x} for k, s, x in rows),
        codec=codec,
        block_records=block,
    )
    assert list(AL.iter_avro_rows(p)) == [tuple(r) for r in rows]


@settings(max_examples=25, deadline=None)
@given(
    st.binary(min_size=0, max_size=6000),
    st.integers(2, 8),
)
def test_gif_lzw_roundtrip_lossless(data, min_code_size):
    """GIF-LZW is LOSSLESS: any byte stream (clamped into the code
    alphabet) round-trips exactly, at every min code size — including
    streams long enough to cross width bumps and the 4096-entry reset.
    hypothesis shrinks straight to the boundary cases."""
    from etl_drone_sense_spark.operators.multimodal import (
        _lzw_compress_gif,
        _lzw_decompress_gif,
    )

    alphabet = 1 << min_code_size
    clamped = bytes(b % alphabet for b in data)
    out = _lzw_decompress_gif(
        _lzw_compress_gif(clamped, min_code_size), min_code_size
    )
    assert out == clamped


@settings(max_examples=15, deadline=None)
@given(_img_dims, st.integers(0, 2**32 - 1))
def test_gif_image_roundtrip_exact(dims, seed):
    """Unlike JPEG, the full GIF image pipeline is bit-exact: random
    indices through a random palette decode to exactly the palette
    lookup of the input raster."""
    import numpy as np

    from etl_drone_sense_spark.operators.multimodal import encode_gif, parse_gif

    w, h = dims
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 256, w * h, dtype=np.uint8)
    pal = rng.integers(0, 256, 256 * 3, dtype=np.uint8)
    got_w, got_h, rgb = parse_gif(encode_gif(w, h, idx.tobytes(), pal.tobytes()))
    assert (got_w, got_h) == (w, h)
    assert rgb == pal.reshape(-1, 3)[idx].reshape(-1).tobytes()


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 6),
    st.integers(1, 5),
    st.booleans(),
    st.randoms(use_true_random=False),
)
def test_bmp_roundtrip_and_mutation_quarantine(w, h, top_down, rnd):
    """Any 24-bit raster roundtrips through encode_bmp/parse_bmp in both
    row orders; any single-byte mutation of the container either still
    decodes to SOMETHING or raises ValueError — never escapes as another
    exception type (the quarantine contract the PNG/JPEG fuzz pins)."""
    from etl_drone_sense_spark.operators.multimodal import encode_bmp, parse_bmp

    raster = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    payload = encode_bmp(w, h, raster, top_down=top_down)
    assert parse_bmp(payload) == (w, h, raster)
    mutated = bytearray(payload)
    pos = rnd.randrange(len(mutated))
    mutated[pos] = (mutated[pos] + 1 + rnd.randrange(255)) % 256
    try:
        parse_bmp(bytes(mutated))
    except ValueError:
        pass


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.floats(min_value=0.0, max_value=500.0,
                       allow_nan=False, allow_infinity=False),
             min_size=1, max_size=40),
)
def test_holt_fold_matches_reference_recurrence(values):
    """The packed-BIGINT Holt fold (events_holt_trend) must equal an
    independent plain-Python recurrence at every step — level and
    trend both, including negative trends where the truncating-halving
    convention is the load-bearing detail (floor-based halving WOULD
    diverge there, which is why the fold uses `div 2`/`// 2`)."""
    from etl_drone_sense_spark.plans.extensions import _HOLT_B, _HOLT_P

    import math

    xs = [math.floor(v * 1e6 + 0.5) for v in values]

    def trunc_half(v: int) -> int:
        # truncation toward zero — Spark `div 2` == DuckDB `// 2`
        return -((-v) // 2) if v < 0 else v // 2

    # reference recurrence, unpacked
    l = xs[0]
    b = 0
    for x in xs[1:]:
        l2 = trunc_half(x + l + b)
        b = trunc_half(b + l2 - l)
        l = l2

    # the packed fold exactly as both engines evaluate it
    acc = -1
    for x in xs:
        if acc < 0:
            acc = (x + _HOLT_B) * _HOLT_P + _HOLT_B
        else:
            lv = (acc // _HOLT_P) - _HOLT_B  # acc >= 0: // == div
            tr = (acc % _HOLT_P) - _HOLT_B
            l2 = trunc_half(x + lv + tr)
            b2 = trunc_half(tr + l2 - lv)
            acc = (l2 + _HOLT_B) * _HOLT_P + (b2 + _HOLT_B)
    assert (acc // _HOLT_P) - _HOLT_B == l
    assert (acc % _HOLT_P) - _HOLT_B == b
    # packing headroom: both components provably nonnegative
    assert 0 <= l + _HOLT_B < _HOLT_P
    assert 0 <= b + _HOLT_B < _HOLT_P

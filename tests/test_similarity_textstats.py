"""Similarity search + text statistics + multimodal plumbing."""

import math
import random

import numpy as np
from pyspark.sql import functions as F

from ckg_spark.operators import multimodal as MM
from ckg_spark.operators import similarity as S
from ckg_spark.operators import textstats as TS


def _vectors(spark, n=200, dim=16, seed=3):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), rows


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def test_cosine_topk_exact(spark):
    df, rows = _vectors(spark)
    q = rows[0][1]
    got = S.cosine_topk(df, q, k=5).toPandas()
    # brute force in python (float32 storage -> compare on ordering)
    exp = sorted(
        ((i, _cos([np.float32(x) for x in v], q)) for i, v in rows),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert list(got["vec_id"]) == [i for i, _ in exp]
    for (gv, (_, ev)) in zip(got["cosine"], exp):
        assert abs(gv - ev) < 1e-6


def test_lsh_topk_contains_query_itself(spark):
    df, rows = _vectors(spark)
    q = rows[7][1]
    got = S.lsh_topk(df, q, k=3, n_planes=8, multiprobe_hamming=2).toPandas()
    assert int(got.iloc[0]["vec_id"]) == 7
    assert got.iloc[0]["cosine"] > 0.9999


def test_embedding_near_dups(spark):
    base = [1.0] * 8
    near = [1.0] * 7 + [1.05]
    far = [-1.0] * 8
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)],
        "vec_id long, embedding array<float>",
    )
    got = S.embedding_near_dups(df, threshold=0.99, n_planes=6)
    pairs = {(int(r["id_a"]), int(r["id_b"])) for r in got.collect()}
    assert (1, 4) in pairs and (1, 2) in pairs and (2, 4) in pairs
    assert not any(3 in p for p in pairs)


def test_textstats_basics(spark):
    df = spark.createDataFrame(
        [(1, "The cat and the dog, in the house!!!"),
         (2, ""),
         (3, None),
         (4, "el la de que y en los del se por")],
        "doc_id long, text string",
    )
    got = TS.document_stats(df).toPandas().set_index("doc_id")
    assert got.loc[1, "n_tokens"] == 8
    assert got.loc[2, "n_tokens"] == 0 and got.loc[3, "n_tokens"] == 0
    assert got.loc[1, "lang_guess"] == "en"
    assert got.loc[4, "lang_guess"] == "es"
    assert 0 < got.loc[1, "punct_ratio"] < 0.2
    # fingerprint: punctuation/case-insensitive
    df2 = spark.createDataFrame(
        [(1, "the CAT and the dog in the house")], "doc_id long, text string"
    )
    fp1 = got.loc[1, "fingerprint"]
    fp2 = TS.document_stats(df2).toPandas().iloc[0]["fingerprint"]
    assert fp1 == fp2


def test_rolling_fingerprint_edit_tolerance(spark):
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    b = a + " tail_word"  # suffix edit keeps min-gram fingerprint with high prob
    df = spark.createDataFrame([(1, a), (2, b), (3, "totally different words here x y z a b")],
                               "doc_id long, text string")
    got = df.select("doc_id", TS.rolling_fingerprint(F.col("text"), window=4).alias("fp")) \
            .toPandas().set_index("doc_id")["fp"].to_dict()
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_multimodal_plumbing(spark):
    ids = spark.range(0, 20).withColumnRenamed("id", "media_id")
    media = MM.attach_fake_media(ids, "media_id", kind="video")
    feats = MM.decode_features(media).toPandas()
    assert len(feats) == 20
    assert all(len(f) == MM.FEATURE_DIM for f in feats["features"])
    # deterministic: same payload -> same features
    feats2 = MM.decode_features(media).toPandas()
    f1 = {m: list(f) for m, f in zip(feats["media_id"], feats["features"])}
    f2 = {m: list(f) for m, f in zip(feats2["media_id"], feats2["features"])}
    assert f1 == f2
    frames = MM.frame_sample(media, every_n=2).toPandas()
    assert (frames["frame_idx"] % 2 == 0).all()
    rs = MM.resize_meta(media, max_side=128).toPandas()
    assert (rs["target_w"] <= 128).all() and (rs["target_h"] <= 128).all()

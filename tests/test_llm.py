"""LLM-extension tests: dedup recall, ANN recall vs brute force,
multimodal plumbing, text metrics on crafted docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestDedup:
    def test_exact_dedup_groups_copies(self, spark):
        from autoaudit_spark.llm.dedup import q_dedup_exact  # noqa: F401
        docs = _docs(spark, ["a b c", "a b c", "x y z"])
        out = (
            docs.select(F.sha2("text", 256).alias("h"), "doc_id")
            .groupBy("h")
            .agg(F.min("doc_id").alias("keep"), F.count("*").alias("n"))
            .collect()
        )
        by_n = sorted(r["n"] for r in out)
        assert by_n == [1, 2]

    def test_minhash_lsh_finds_near_dups(self, spark):
        from autoaudit_spark.llm.dedup import minhash_signatures, shingles

        base = "the quick brown fox jumps over the lazy dog again and again today"
        near = base.replace("today", "tomorrow")
        far = "completely different words describing some other topic entirely now ok"
        docs = _docs(spark, [base, near, far])
        sh = shingles(docs)
        sig = {r["doc_id"]: r["sig"] for r in minhash_signatures(sh).collect()}
        agree_near = sum(a == b for a, b in zip(sig[0], sig[1]))
        agree_far = sum(a == b for a, b in zip(sig[0], sig[2]))
        assert agree_near > agree_far
        assert agree_near >= 32  # J≈0.7 → most minhashes agree

    def test_simhash_near_for_similar_docs(self, spark):
        from autoaudit_spark.llm.dedup import simhash_signatures

        base = "the quick brown fox jumps over the lazy dog again and again today"
        near = base.replace("today", "tomorrow")
        far = "completely different words describing some other topic entirely now ok"
        docs = _docs(spark, [base, near, far])
        sig = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
        ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")
        assert ham(sig[0], sig[1]) < ham(sig[0], sig[2])


class TestANN:
    def test_lsh_recall_vs_brute_force(self, spark):
        from autoaudit_spark.registry import QUERIES

        brute = {
            (r["query_id"], r["neighbor_id"])
            for r in QUERIES["ann_cosine_topk"](spark, SF).collect()
        }
        lsh = {
            (r["query_id"], r["neighbor_id"])
            for r in QUERIES["ann_lsh_topk"](spark, SF).collect()
        }
        # LSH candidates are a subset of the corpus; recall of the true
        # top-5 should be nontrivial but needn't be 1
        assert lsh, "LSH produced no candidates at all"
        recall = len(brute & lsh) / len(brute)
        assert recall > 0.05

    def test_cosine_expression(self, spark):
        from autoaudit_spark.llm.similarity import cosine_sim

        df = spark.createDataFrame(
            [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
            "a array<double>, b array<double>",
        )
        out = [r["c"] for r in df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).collect()]
        assert out[0] == pytest.approx(1.0)
        assert out[1] == pytest.approx(0.0)


class TestText:
    def test_token_stats_crafted(self, spark):
        from autoaudit_spark.llm.text import STOPWORDS  # noqa: F401

        docs = _docs(spark, ["the cat sat on the mat"])
        docs.createOrReplaceTempView("tdocs")
        t = F.split(F.trim(F.col("text")), r"\s+")
        row = docs.select(
            F.size(t).alias("n"),
            F.size(F.array_distinct(t)).alias("d"),
        ).collect()[0]
        assert (row["n"], row["d"]) == (6, 5)


class TestMultimodal:
    def test_fake_decoder_deterministic(self):
        from autoaudit_spark.llm.multimodal import decode_image_fake, decode_image_real

        a = decode_image_fake(b"payload")
        assert a == decode_image_fake(b"payload")
        assert a[2] == "fake" and 16 <= a[0] < 256 and 16 <= a[1] < 256
        with pytest.raises(NotImplementedError):
            decode_image_real(b"payload")

    def test_media_features_pipeline(self, spark):
        from autoaudit_spark.llm.multimodal import extract_media_features, multimodal_table

        mm = multimodal_table(spark, SF)
        out = extract_media_features(mm)
        rows = out.collect()
        assert len(rows) == 500
        r0 = next(r for r in rows if r["doc_id"] == 0)
        assert r0["format"] == "fake" and r0["payload_bytes"] > 0


class TestApproxAggregates:
    def test_approx_tracks_exact_within_rsd(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import load_table

        approx = {
            r["event_type"]: (r["approx_users"], r["approx_median_value"])
            for r in QUERIES["approx_distinct_stats"](spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        exact = {
            r["event_type"]: (r["u"], r["m"])
            for r in ev.groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("u"),
                F.median("value").alias("m"),
            )
            .collect()
        }
        assert set(approx) == set(exact)
        for et, (u, m) in exact.items():
            au, am = approx[et]
            assert abs(au - u) <= max(3, 0.05 * u)
            # percentile_approx with 10k accuracy is near-exact at test scale
            assert am == pytest.approx(m, rel=0.05)


class TestIVF:
    def test_ivf_recall_vs_brute_force(self, spark):
        from autoaudit_spark.registry import QUERIES

        brute = {
            (r["query_id"], r["neighbor_id"])
            for r in QUERIES["ann_cosine_topk"](spark, SF).collect()
        }
        ivf = {
            (r["query_id"], r["neighbor_id"])
            for r in QUERIES["ann_ivf_topk"](spark, SF).collect()
        }
        assert ivf
        recall = len(brute & ivf) / len(brute)
        assert recall > 0.2  # nprobe=2 of 8 lists probes ~1/4 of the corpus

    def test_kmeans_training_improves_assignment_quality(self, spark):
        """Lloyd rounds must improve the k-means objective — mean cosine
        of each vector to its assigned centroid (measured: 0.187 seeds →
        0.255 after 2 rounds at sf0.001; deterministic, no flake). Recall
        at fixed nprobe is NOT asserted to increase: on the deliberately
        near-isotropic testdata, better-balanced lists can shuffle
        boundary neighbors (measured ±0.04 either way), while the
        quantization quality the index actually optimizes rises steadily."""
        from autoaudit_spark.llm.similarity import (
            IVF_KMEANS_ROUNDS, _dvec, cosine_sim, kmeans_centroids,
        )
        from autoaudit_spark.sources import load_table
        from pyspark.sql.window import Window

        emb = load_table(spark, SF, "embeddings").select(
            "vec_id", _dvec("embedding").alias("v")
        )

        def quality(rounds):
            cent = kmeans_centroids(spark, emb, rounds=rounds)
            wa = Window.partitionBy("vec_id").orderBy(
                F.col("csim").desc(), F.col("cid")
            )
            return (
                emb.crossJoin(F.broadcast(cent))
                .select(
                    "vec_id", "cid",
                    F.round(cosine_sim(F.col("v"), F.col("cv")), 6).alias("csim"),
                )
                .withColumn("rn", F.row_number().over(wa))
                .filter("rn = 1")
                .agg(F.avg("csim"))
                .collect()[0][0]
            )

        q0, qk = quality(0), quality(IVF_KMEANS_ROUNDS)
        assert qk > q0 + 0.02  # well beyond rounding noise

    def test_kmeans_centroids_move_and_stay_finite(self, spark):
        from autoaudit_spark.llm.similarity import (
            IVF_LISTS, _dvec, kmeans_centroids,
        )
        from autoaudit_spark.sources import load_table

        emb = load_table(spark, SF, "embeddings").select(
            "vec_id", _dvec("embedding").alias("v")
        )
        c0 = {r["cid"]: r["cv"] for r in kmeans_centroids(spark, emb, 0).collect()}
        c2 = {r["cid"]: r["cv"] for r in kmeans_centroids(spark, emb, 2).collect()}
        assert set(c0) == set(c2) and len(c2) == IVF_LISTS
        moved = sum(1 for k in c0 if c0[k] != c2[k])
        assert moved >= IVF_LISTS // 2  # training actually updates centroids
        assert all(all(abs(x) < 1e6 for x in v) for v in c2.values())


class TestPipelineOps:
    def test_chunks_reassemble_to_document(self, spark):
        """Dropping each chunk's overlap prefix and concatenating must
        reconstruct the original text exactly."""
        from autoaudit_spark.llm.text import (
            CHUNK_SIZE, CHUNK_STRIDE, q_chunk_documents,
        )
        from autoaudit_spark.sources import load_table

        chunks = {}
        for r in q_chunk_documents(spark, SF).collect():
            chunks.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_start"], r["chunk_text"])
            )
        texts = {
            r["doc_id"]: r["text"]
            for r in load_table(spark, SF, "documents").collect()
        }
        assert chunks
        for doc_id, cs in list(chunks.items())[:20]:
            cs.sort()
            rebuilt = cs[0][2]
            for _, start, txt in cs[1:]:
                rebuilt = rebuilt[: start] + txt
            assert rebuilt == texts[doc_id]
            for cid, start, txt in cs:
                assert start == cid * CHUNK_STRIDE
                assert len(txt) <= CHUNK_SIZE

    def test_frame_sample_bounds(self, spark):
        from autoaudit_spark.llm.multimodal import (
            FRAME_MAX, multimodal_table, sample_frames,
        )

        mm = multimodal_table(spark, SF)
        sizes = {r["doc_id"]: len(bytes(r["payload"])) for r in mm.collect()}
        per_doc = {}
        for r in sample_frames(mm).collect():
            n = sizes[r["doc_id"]]
            assert 0 <= r["frame_off"] < max(n, 1)
            assert r["frame_off"] + r["frame_len"] <= n
            assert len(bytes(r["frame_bytes"])) == r["frame_len"]
            per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
        assert per_doc and max(per_doc.values()) <= FRAME_MAX

    def test_resize_geometry(self, spark):
        from autoaudit_spark.llm.multimodal import (
            RESIZE_BOX, multimodal_table, resize_media,
        )

        rows = resize_media(multimodal_table(spark, SF)).collect()
        assert rows
        for r in rows:
            assert 1 <= r["out_w"] <= RESIZE_BOX
            assert 1 <= r["out_h"] <= RESIZE_BOX
            if max(r["width"], r["height"]) <= RESIZE_BOX:
                assert (r["out_w"], r["out_h"]) == (r["width"], r["height"])
            else:
                assert max(r["out_w"], r["out_h"]) == RESIZE_BOX
            assert r["out_bytes"] == r["out_w"] * r["out_h"] * 3

    def test_stratified_sample_rates(self, spark):
        from autoaudit_spark.llm.text import SAMPLE_PPM, q_sample_stratified
        from autoaudit_spark.sources import load_table
        import pyspark.sql.functions as F

        totals = {
            r["lang"]: r["n"]
            for r in load_table(spark, SF, "documents")
            .groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        kept = {}
        for r in q_sample_stratified(spark, SF).collect():
            kept[r["lang"]] = kept.get(r["lang"], 0) + 1
        for lang, ppm in SAMPLE_PPM.items():
            if totals.get(lang, 0) >= 30:
                rate = kept.get(lang, 0) / totals[lang]
                assert abs(rate - ppm / 1e6) < 0.25


class TestArithmeticHashTwins:
    def test_arith_token_hash_known_value(self, spark):
        from autoaudit_spark.llm.text import arith_token_hash

        df = spark.createDataFrame([("ab",)], "tok string")
        got = df.select(arith_token_hash(F.col("tok")).alias("h")).collect()[0]["h"]
        assert got == (0 * 131 + 97) % 1000000007 * 131 + 98  # 12805

    def test_simhash_hashed_orders_similarity(self, spark):
        from autoaudit_spark.llm.dedup import simhash_signatures_hashed

        base = "the quick brown fox jumps over the lazy dog again and again today"
        near = base.replace("today", "tomorrow")
        far = "completely different words describing some other topic entirely now ok"
        docs = _docs(spark, [base, near, far])
        sig = {
            r["doc_id"]: r["simhash"]
            for r in simhash_signatures_hashed(docs).collect()
        }
        ham = lambda a, b: bin(a ^ b).count("1")
        assert ham(sig[0], sig[1]) < ham(sig[0], sig[2])

    def test_sign_planes_deterministic_and_balanced(self):
        import numpy as np
        from autoaudit_spark.llm.similarity import sign_planes

        m = sign_planes()
        assert (m == sign_planes()).all()
        assert set(np.unique(m)) == {-1.0, 1.0}
        assert 0.3 < (m > 0).mean() < 0.7


class TestDocFingerprintRetiredKernel:
    def test_xxhash_kernel_agrees_with_hashed_twin_structure(self, spark):
        """The r15 retirement swap keeps the xxhash64 fingerprint KERNEL
        tested even though its driver row retired: both fingerprint
        forms count distinct token-5-gram hashes per document, so on
        real data they must emit the same doc_id set and (absent hash
        collisions, none at this scale) identical n_grams per doc —
        only min/max differ (engine-specific vs portable hash)."""
        from autoaudit_spark.llm.text import (
            q_doc_fingerprint,
            q_doc_fingerprint_hashed,
        )

        rows = q_doc_fingerprint(spark, SF).collect()
        raw = {r["doc_id"]: r["n_grams"] for r in rows}
        hashed = {
            r["doc_id"]: r["n_grams"]
            for r in q_doc_fingerprint_hashed(spark, SF).collect()
        }
        assert raw, "fingerprint kernel empty at sf0.001"
        assert raw == hashed
        # r16 (r15 ADVICE): the retired driver row was the only check
        # that ever touched the kernel's min/max fingerprint columns —
        # pin their invariants here so a swapped min/max or dropped
        # null-filter can't regress silently.
        for r in rows:
            assert r["min_hash"] is not None and r["max_hash"] is not None
            assert r["min_hash"] <= r["max_hash"]
            assert r["n_grams"] >= 1
            # >1 distinct gram forces a strict spread (collision-free
            # at fixture scale)
            if r["n_grams"] > 1:
                assert r["min_hash"] < r["max_hash"]


class TestRetention:
    def test_retention_clusters_transitively(self, spark):
        """a~b and b~c near-dups (a≁c directly) must land in ONE cluster
        with the min doc_id canonical — the transitive-closure semantics
        that pairwise filtering alone cannot give."""
        from autoaudit_spark.llm.dedup import retention_components

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        a = base
        b = base + " lambda mu"
        c = base + " lambda mu nu xi omicron pi rho sigma"
        lone = "completely different words nothing shared here at all ok"
        docs = _docs(spark, [a, b, c, lone])
        comp = {r["node"]: r["component"] for r in retention_components(docs).collect()}
        assert comp.get(0) == comp.get(1) == comp.get(2) == 0
        assert 3 not in comp  # singleton never enters the pair graph

    def test_retention_marks_one_keeper_per_cluster(self, spark):
        from autoaudit_spark.llm.dedup import q_dedup_retention

        out = q_dedup_retention(spark, SF).collect()
        by_canon = {}
        for r in out:
            by_canon.setdefault(r["canonical_doc_id"], []).append(r)
        for canon, rows in by_canon.items():
            keepers = [r for r in rows if r["is_kept"]]
            assert len(keepers) == 1 and keepers[0]["doc_id"] == canon
            assert all(r["cluster_size"] == len(rows) for r in rows)

    def test_corpus_filter_subset_semantics(self, spark):
        """corpus_filter ⊆ kept-by-dedup ∩ quality ≥ τ."""
        from autoaudit_spark.llm.dedup import (
            QUALITY_MIN,
            q_corpus_filter,
            q_dedup_retention,
        )

        kept_ids = {
            r["doc_id"]
            for r in q_dedup_retention(spark, SF).filter("is_kept").collect()
        }
        out = q_corpus_filter(spark, SF).collect()
        assert out, "filter should keep something at sf0.001"
        assert all(r["doc_id"] in kept_ids for r in out)
        assert all(r["quality"] >= QUALITY_MIN for r in out)


class TestRealCodecs:
    """The pure-NumPy/stdlib media kernels (BMP/PGM/WAV/NN-resize) —
    real decoders, verified against hand-built fixtures."""

    def test_bmp_roundtrip_exact_pixels(self):
        import numpy as np

        from autoaudit_spark.llm.multimodal import decode_bmp, encode_bmp_gray24

        data = bytes(range(256)) * 3
        bmp = encode_bmp_gray24(data, width=32, max_pixels=1024)
        assert bmp[:2] == b"BM"
        img, w, h = decode_bmp(bmp)
        assert (w, h) == (32, 24)
        got = img[:, :, 0].reshape(-1)[: len(data[:1024])]
        assert np.array_equal(got, np.frombuffer(data[:1024], np.uint8))
        # channels equal (gray) and R==G==B
        assert np.array_equal(img[:, :, 0], img[:, :, 1])
        assert np.array_equal(img[:, :, 0], img[:, :, 2])

    def test_bmp_stride_padding_nonmultiple_width(self):
        import numpy as np

        from autoaudit_spark.llm.multimodal import decode_bmp, encode_bmp_gray24

        # width 10 → stride 30 → padded to 32: decoder must skip pad bytes
        bmp = encode_bmp_gray24(bytes(range(30)), width=10, max_pixels=30)
        img, w, h = decode_bmp(bmp)
        assert (w, h) == (10, 3)
        assert np.array_equal(
            img[:, :, 0].reshape(-1), np.frombuffer(bytes(range(30)), np.uint8)
        )

    def test_pgm_decode(self):
        import numpy as np

        from autoaudit_spark.llm.multimodal import decode_pgm

        raster = bytes(range(12))
        payload = b"P5\n# a comment\n4 3\n255\n" + raster
        img, w, h = decode_pgm(payload)
        assert (w, h) == (4, 3)
        assert np.array_equal(
            img.reshape(-1), np.frombuffer(raster, np.uint8)
        )

    def test_wav_decode_stdlib(self):
        import io
        import wave

        from autoaudit_spark.llm.multimodal import decode_image_real

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(b"\x00\x01" * 2 * 100)
        frames, channels, fmt = decode_image_real(buf.getvalue())
        assert (frames, channels, fmt) == (100, 2, "wav")

    def test_compressed_formats_still_raise(self):
        """A TRUNCATED JPEG, a corrupt PNG, and a truncated GIF all raise
        the vendored decoders' clear data-at-fault messages (r7: GIF is
        vendored too — the env-gated branch is gone)."""
        import pytest as _pytest

        from autoaudit_spark.llm.multimodal import decode_image_real

        with _pytest.raises(NotImplementedError, match="JPEG"):
            decode_image_real(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
        with _pytest.raises(NotImplementedError, match="PNG"):
            decode_image_real(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
        with _pytest.raises(NotImplementedError, match="GIF"):
            decode_image_real(b"GIF89a" + b"\x00" * 16)

    def test_gif_decodes_without_pil(self):
        """r7: the vendored gifdec completes the codec trio — a valid
        GIF now decodes in-container with or without Pillow."""
        from autoaudit_spark.llm.gifdec import encode_gif
        from autoaudit_spark.llm.multimodal import decode_image_real

        import numpy as np

        img = np.zeros((3, 5, 3), dtype=np.uint8)
        img[1, 2] = (255, 0, 0)
        assert decode_image_real(encode_gif(img)) == (5, 3, "gif")

    def test_png_decodes_without_pil(self):
        """r6: the vendored pngdec closes the env-gated PNG branch — a
        VALID 1×1 PNG now decodes in-container with or without Pillow
        (Pillow, when present, is still tried first upstream)."""
        import base64

        from autoaudit_spark.llm.multimodal import decode_image_real

        png = base64.b64decode(
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42m"
            "P8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
        )
        assert decode_image_real(png) == (1, 1, "png")

    def test_resize_nearest_known_mapping(self):
        import numpy as np

        from autoaudit_spark.llm.multimodal import resize_nearest

        img = np.arange(64, dtype=np.uint8).reshape(8, 8)
        out = resize_nearest(img, 4)
        assert out.shape == (4, 4)
        # index map: yi = floor(i*8/4) = 0,2,4,6
        assert np.array_equal(out, img[[0, 2, 4, 6]][:, [0, 2, 4, 6]])
        # no-op when already inside the box
        assert resize_nearest(img, 8) is img


class TestInt8ANN:
    def test_recall_vs_exact_cosine(self, spark, sf_dir):
        """int8 symmetric quantization should preserve most of the exact
        top-5 neighbor set (the standard quality bar for 8-bit codes)."""
        from autoaudit_spark.registry import QUERIES

        exact = {}
        for r in QUERIES["ann_cosine_topk"](spark, sf_dir).collect():
            exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        quant = {}
        for r in QUERIES["ann_int8_topk"](spark, sf_dir).collect():
            quant.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        assert set(exact) == set(quant)
        hits = sum(len(exact[q] & quant[q]) for q in exact)
        total = sum(len(exact[q]) for q in exact)
        assert hits / total >= 0.8, f"recall@5 {hits}/{total}"

    def test_codes_bounded_and_scale_invariant(self, spark):
        import pyspark.sql.functions as F

        from autoaudit_spark.llm.similarity import int8_codes

        df = spark.createDataFrame(
            [([0.1, -0.4, 0.2],), ([1000.0, -4000.0, 2000.0],), ([0.0, 0.0, 0.0],)],
            "v array<double>",
        ).select(int8_codes(F.col("v")).alias("q"))
        rows = [r["q"] for r in df.collect()]
        # same direction, different magnitude → identical codes
        assert rows[0] == rows[1]
        assert rows[2] == [0, 0, 0]
        assert all(-127 <= c <= 127 for q in rows for c in q)


class TestRound6Additions:
    def test_semdedup_subset_of_brute_pairs(self, spark, sf_dir):
        """Cluster-bucketed near-dup can only MISS boundary pairs, never
        invent them: every (id1, id2, cos) it reports must appear in the
        brute-force pair set at the same similarity (restricted to the
        brute twin's vec_id < 500 oracle bound)."""
        from autoaudit_spark.registry import QUERIES

        ivf = {
            (r["id1"], r["id2"]): r["cos_sim"]
            for r in QUERIES["near_dup_embedding_ivf"](spark, sf_dir).collect()
            if r["id1"] < 500 and r["id2"] < 500
        }
        brute = {
            (r["id1"], r["id2"]): r["cos_sim"]
            for r in QUERIES["near_dup_embedding"](spark, sf_dir).collect()
        }
        assert set(ivf) <= set(brute)
        assert all(brute[k] == v for k, v in ivf.items())
        assert len(ivf) > 0

    def test_semdedup_pairs_share_a_cluster(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["near_dup_embedding_ivf"](spark, sf_dir).collect()
        assert all(r["cid"] >= 0 for r in rows)

    def test_mix_allocation_sums_to_budget(self, spark, sf_dir):
        from autoaudit_spark.llm.text import MIX_BUDGET
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["corpus_mix_allocation"](spark, sf_dir).collect()
        assert sum(r["alloc"] for r in rows) == MIX_BUDGET
        assert all(r["alloc"] in (r["base_alloc"], r["base_alloc"] + 1) for r in rows)
        # proportionality: alloc within 1 of the exact ideal share
        total = sum(r["g_tokens"] for r in rows)
        for r in rows:
            ideal = MIX_BUDGET * r["g_tokens"] / total
            assert abs(r["alloc"] - ideal) < 1.0

    def test_mix_allocation_largest_remainder_crafted(self, spark, tmp_path):
        """Hamilton apportionment on a hand-computed case: budget 10 over
        token masses 5/3/1 (total 9) → ideals 5.55/3.33/1.11, bases
        5/3/1, leftover 1 goes to the largest remainder (.55 → lang a)."""
        from autoaudit_spark.llm import text as text_mod

        rows = [
            (1, "w " * 4 + "w", "a", "s", 9),   # 5 tokens
            (2, "w w w", "b", "s", 5),           # 3 tokens
            (3, "w", "c", "s", 1),               # 1 token
        ]
        d = str(tmp_path / "mix_sf")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        orig = text_mod.MIX_BUDGET
        text_mod.MIX_BUDGET = 10
        try:
            # the registered oracle SQL bakes the module constant in, so
            # this drives only the Spark side (the @query decorator
            # returns the fn unchanged)
            got = {
                r["lang"]: (r["base_alloc"], r["extra"], r["alloc"])
                for r in text_mod.q_corpus_mix_allocation(spark, d).collect()
            }
        finally:
            text_mod.MIX_BUDGET = orig
        assert got == {
            "a": (5, 1, 6),
            "b": (3, 0, 3),
            "c": (1, 0, 1),
        }

    def test_mix_allocation_exact_above_2_53(self, spark, tmp_path):
        """ADVICE r6: base_alloc must come from exact integer `div`, not
        floor(double division). budget = 2^53+1 over a single 1-token
        stratum makes the double path misfloor — double(2^53+1) rounds
        ties-to-even down to 2^53 — while the exact quotient is 2^53+1
        (the X45 divergence class, now armed on the quotient side)."""
        import duckdb

        from autoaudit_spark.llm import text as text_mod

        d = str(tmp_path / "mix53")
        spark.createDataFrame(
            [(1, "w", "a", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        budget = 2**53 + 1
        orig = text_mod.MIX_BUDGET
        text_mod.MIX_BUDGET = budget
        try:
            rows = text_mod.q_corpus_mix_allocation(spark, d).collect()
        finally:
            text_mod.MIX_BUDGET = orig
        assert len(rows) == 1
        r = rows[0]
        assert r["base_alloc"] == budget  # floor(double) path yields 2**53
        assert r["alloc"] == budget
        # DuckDB's BIGINT `//` — the oracle's semantics — is exact here too
        assert (
            duckdb.sql(f"SELECT CAST({budget} AS BIGINT) * 1 // 1").fetchone()[0]
            == budget
        )


class TestRound7Births:
    def _docs_dir(self, spark, tmp_path, rows, name):
        d = str(tmp_path / name)
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        return d

    def test_contamination_flags_copied_benchmark_text(self, spark, tmp_path):
        """doc 0 (0 % 37 == 0) is benchmark; doc 1 copies it verbatim →
        every 5-gram overlaps → flagged; doc 2 is disjoint → clean."""
        from autoaudit_spark.registry import QUERIES

        bench_text = "alpha beta gamma delta epsilon zeta eta"
        rows = [
            (0, bench_text, "en", "s", 1),
            (1, bench_text, "en", "s", 1),
            (2, "one two three four five six seven", "en", "s", 1),
        ]
        d = self._docs_dir(spark, tmp_path, rows, "contam")
        got = {
            r["doc_id"]: r
            for r in QUERIES["contamination_ngram"](spark, d).collect()
        }
        assert set(got) == {1, 2}  # doc 0 is the benchmark side
        assert got[1]["flagged"] == 1 and got[1]["contam_frac"] == 1.0
        assert got[1]["n_grams"] == 3  # 7 tokens → 3 five-grams
        assert got[2]["flagged"] == 0 and got[2]["n_shared"] == 0

    def test_contamination_sf_fixture_invariants(self, spark, sf_dir):
        from autoaudit_spark.llm.text import CONTAM_BENCH_MOD
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["contamination_ngram"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["doc_id"] % CONTAM_BENCH_MOD != 0
            assert 0 <= r["n_shared"] <= r["n_grams"]
            assert (r["flagged"] == 1) == (
                r["n_shared"] / r["n_grams"] >= 0.5
            )

    def test_pps_sample_crossing_invariants(self, spark, sf_dir):
        """Every pick crosses a stride boundary; buckets are strictly
        increasing; sample size is within one of the span count."""
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["pps_sample"](spark, sf_dir).collect()
        assert rows
        buckets = [r["pick_bucket"] for r in rows]
        assert buckets == sorted(buckets)
        assert len(set(buckets)) == len(buckets)
        for r in rows:
            assert r["n_tokens"] >= 1
            assert r["cum_tokens"] >= r["n_tokens"]

    def test_pps_sample_prefers_heavy_docs(self, spark, tmp_path):
        """One doc holding >1/100 of the token mass must always be
        picked; 100 one-token docs around it mostly are not."""
        from autoaudit_spark.registry import QUERIES

        rows = [(i, "w", "en", "s", 1) for i in range(100)]
        rows.append((100, " ".join(["w"] * 900), "en", "s", 900))
        d = self._docs_dir(spark, tmp_path, rows, "pps")
        got = [r["doc_id"] for r in QUERIES["pps_sample"](spark, d).collect()]
        assert 100 in got
        # total = 1000 tokens, stride = 10: the heavy doc spans 90 strides
        assert len(got) <= 101

    def test_dedup_components_crafted_clusters(self, spark, tmp_path):
        """Two verbatim-duplicate clusters → two components, exactly one
        keep per cluster, csize = cluster size; the unique doc absent."""
        from autoaudit_spark.registry import QUERIES

        a = "the quick brown fox jumps over the lazy dog today"
        b = "entirely different words compose this second document text here"
        rows = [
            (1, a, "en", "s", 1),
            (2, a, "en", "s", 1),
            (3, a, "en", "s", 1),
            (10, b, "en", "s", 1),
            (11, b, "en", "s", 1),
            (99, "totally unrelated singleton content with unique words", "en", "s", 1),
        ]
        d = self._docs_dir(spark, tmp_path, rows, "clusters")
        got = {
            r["doc_id"]: r
            for r in QUERIES["dedup_components"](spark, d).collect()
        }
        assert set(got) == {1, 2, 3, 10, 11}
        assert {got[i]["component"] for i in (1, 2, 3)} == {1}
        assert {got[i]["component"] for i in (10, 11)} == {10}
        assert [i for i in got if got[i]["keep"] == 1] == [1, 10]
        assert got[1]["csize"] == 3 and got[10]["csize"] == 2

    def test_dedup_components_keep_one_per_component(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["dedup_components"](spark, sf_dir).collect()
        assert rows
        comps = {r["component"] for r in rows}
        keeps = [r for r in rows if r["keep"] == 1]
        assert len(keeps) == len(comps)
        assert all(r["doc_id"] == r["component"] for r in keeps)
        assert all(r["csize"] >= 2 for r in rows)

    def test_dedup_components_gate_branches_agree(
        self, spark, sf_dir, monkeypatch
    ):
        """r17 size-gate pin: the driver union-find (small branch) and
        the distributed hash-min loop (large branch) must label the
        SAME pair graph identically — forced by flipping the gate to −1
        so the big branch runs on data that normally takes the small
        one."""
        from autoaudit_spark.llm import dedup as dd
        from autoaudit_spark.registry import QUERIES

        small = sorted(
            (r["doc_id"], r["component"], r["csize"], r["keep"])
            for r in QUERIES["dedup_components"](spark, sf_dir).collect()
        )
        monkeypatch.setattr(dd, "DEDUP_CC_DRIVER_MAX", -1)
        large = sorted(
            (r["doc_id"], r["component"], r["csize"], r["keep"])
            for r in QUERIES["dedup_components"](spark, sf_dir).collect()
        )
        assert small == large


class TestShingleSalting:
    def test_salted_pair_counts_bit_identical_on_hot_shingle(self, spark):
        """r7 skew twin: inject a boilerplate shingle into most docs —
        the salted join must reproduce the unsalted pair counts exactly
        (every a/b pair meets once, in exactly one salt bucket)."""
        from autoaudit_spark.llm.dedup import (
            shingle_pair_counts,
            shingle_pair_counts_salted,
            shingles,
        )

        rows = [
            (i, f"uniq{i} word{i} tail{i} standard legal disclaimer text", "en", "s", 1)
            for i in range(12)
        ] + [(99, "totally different content entirely here", "en", "s", 1)]
        docs = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        sh = shingles(docs)
        a = {tuple(r) for r in shingle_pair_counts(sh).collect()}
        b = {tuple(r) for r in shingle_pair_counts_salted(sh, 8).collect()}
        assert a == b
        assert a  # the boilerplate shingle produced shared pairs

    def test_registered_salted_query_matches_unsalted(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        u = [tuple(r) for r in QUERIES["near_dup_jaccard"](spark, sf_dir).collect()]
        s = [tuple(r) for r in QUERIES["near_dup_jaccard_salted"](spark, sf_dir).collect()]
        assert u == s


class TestCappedJaccard:
    def test_cap_drops_boilerplate_only_pairs(self, spark, tmp_path):
        """Two docs similar ONLY through a boilerplate shingle shared by
        every doc lose their pair under the cap (the documented recall
        trade); a genuine near-dup pair survives with its jaccard
        computed over the capped space."""
        from autoaudit_spark.llm import dedup as dd

        boiler = "standard legal disclaimer text"
        # 8 docs carry the boilerplate (df=8 > cap=5); docs 0/1 share
        # ONLY it; docs 10/11 are genuine near-dups
        rows = [
            (i, f"alpha{i} beta{i} {boiler}", "en", "s", 1)
            for i in range(2)
        ]
        rows += [
            (i, f"filler{i} junk{i} more{i} {boiler}", "en", "s", 1)
            for i in range(2, 8)
        ]
        dup = "the quick brown fox jumps over the lazy dog"
        rows += [(10, dup, "en", "s", 1), (11, dup + " indeed", "en", "s", 1)]
        d = str(tmp_path / "capped")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")

        uncapped = {
            (r["doc1"], r["doc2"])
            for r in dd.q_near_dup_jaccard(spark, d).collect()
        }
        capped = {
            (r["doc1"], r["doc2"])
            for r in dd.q_near_dup_jaccard_capped(spark, d).collect()
        }
        assert (10, 11) in uncapped and (10, 11) in capped
        assert (0, 1) in uncapped          # boilerplate-only similarity
        assert (0, 1) not in capped        # the cap removes it

    def test_cap_bites_on_fixture(self, spark, sf_dir):
        """Non-vacuous on the testdata: some pair's jaccard differs
        between the capped and exact forms (measured: 13/25 at sf0.01)."""
        from autoaudit_spark.registry import QUERIES

        u = {tuple(r) for r in QUERIES["near_dup_jaccard"](spark, sf_dir).collect()}
        c = {tuple(r) for r in QUERIES["near_dup_jaccard_capped"](spark, sf_dir).collect()}
        assert c and u != c


class TestBigramSurprise:
    def test_hand_computed_fixture(self, spark, tmp_path):
        """X71 semantics on a corpus small enough to do by hand:
        bigram counts (a,b)=3 (b,a)=1 (b,c)=1; context counts a=3 b=2.
        doc 1 'a b a b' -> (0 + 1 + 0)/3; doc 2 'a b c' -> (0 + 1)/2."""
        from autoaudit_spark.registry import QUERIES

        rows = [
            (1, "a b a b", "en", "s", 7),
            (2, "a b c", "en", "s", 5),
            (3, "solo", "en", "s", 4),  # single token: no bigrams
        ]
        d = str(tmp_path / "bigram")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["mean_nll"])
            for r in QUERIES["bigram_surprise"](spark, d).collect()
        }
        assert got == {1: (3, round(1 / 3, 6)), 2: (2, 0.5)}

    def test_scrambled_text_scores_higher(self, spark, tmp_path):
        """The signal the operator exists for: repetitive natural order
        scores low, the SAME unigram bag in an improbable order scores
        high — unigram_logprob cannot see this difference."""
        from autoaudit_spark.registry import QUERIES

        natural = "the cat sat . " * 10
        scrambled = "the the the the cat . sat cat sat . " * 2 + "cat the . sat " * 5
        rows = [
            (1, natural.strip(), "en", "s", 1),
            (2, scrambled.strip(), "en", "s", 1),
        ]
        d = str(tmp_path / "scramble")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {r["doc_id"]: r["mean_nll"]
               for r in QUERIES["bigram_surprise"](spark, d).collect()}
        assert got[2] > got[1]

    def test_fixture_invariants(self, spark, sf_dir):
        from autoaudit_spark.registry import QUERIES

        rows = QUERIES["bigram_surprise"](spark, sf_dir).collect()
        assert rows
        assert all(r["mean_nll"] >= 0 and r["n_bigrams"] >= 1 for r in rows)


class TestDsirImportance:
    @staticmethod
    def _py_hash(term):
        acc = 0
        for ch in term:
            acc = (acc * 131 + ord(ch)) % 1000000007
        return acc

    def test_planted_domain_separation(self, spark, tmp_path):
        """Docs made of target-domain vocabulary must get positive log
        importance weight; docs of non-target vocabulary negative —
        the resampling signal DSIR sorts on."""
        from autoaudit_spark.llm.text import HTF_BUCKETS
        from autoaudit_spark.registry import QUERIES

        # guard: the two planted words must not collide in bucket space
        assert (self._py_hash("alpha") % HTF_BUCKETS
                != self._py_hash("beta") % HTF_BUCKETS)
        rows = []
        for i in range(10):
            rows.append((i, "alpha " * 20, "en", "s", 100))
        for i in range(10, 20):
            rows.append((i, "beta " * 20, "de", "s", 100))
        d = str(tmp_path / "dsir")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long"
        ).write.parquet(f"{d}/documents.parquet")

        got = {r["doc_id"]: r["log_weight"]
               for r in QUERIES["dsir_importance"](spark, d).collect()}
        assert all(got[i] > 0 for i in range(10))
        assert all(got[i] < 0 for i in range(10, 20))

    def test_python_replication_sf0001(self, spark):
        """Independent replication: hashed-bucket add-one log-ratio
        weights recomputed in pure Python (engine rounding semantics:
        half-away at 6dp) match every doc's output."""
        import math
        import re
        from collections import defaultdict

        from autoaudit_spark.llm.text import DSIR_TARGET_LANG, HTF_BUCKETS
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import load_table

        def r6(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        sf = "/root/testdata/sf0.001"
        docs = load_table(spark, sf, "documents").collect()
        db, raw, tgt = defaultdict(lambda: defaultdict(int)), defaultdict(int), defaultdict(int)
        for r in docs:
            for term in re.split(r"\s+", r["text"].strip()):
                b = self._py_hash(term.lower()) % HTF_BUCKETS
                db[r["doc_id"]][b] += 1
                raw[b] += 1
                if r["lang"] == DSIR_TARGET_LANG:
                    tgt[b] += 1
        tr, tt = sum(raw.values()), sum(tgt.values())
        lr = {b: r6(math.log2(tgt.get(b, 0) + 1)) - r6(math.log2(raw[b] + 1))
              for b in raw}
        k = r6(math.log2(tr + HTF_BUCKETS)) - r6(math.log2(tt + HTF_BUCKETS))
        got = {r["doc_id"]: (r["n_toks"], r["log_weight"])
               for r in QUERIES["dsir_importance"](spark, sf).collect()}
        assert set(got) == set(db)
        for did, buckets in db.items():
            n = sum(buckets.values())
            lw = sum(c * lr[b] for b, c in buckets.items()) + n * k
            assert got[did][0] == n
            assert abs(got[did][1] - lw) < 2e-6, did


class TestRepeatedPassages:
    def test_planted_shared_passage(self, spark, tmp_path):
        """Two docs sharing a 12-token boilerplate run produce ONE
        merged island each, spanning exactly the shared tokens (8
        duplicated 5-gram starts); a doc with unique text emits
        nothing."""
        from autoaudit_spark.registry import QUERIES

        shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
        rows = [
            (0, "x0 y0 " + shared + " z0", "en", "s", 1),
            (1, "p1 q1 r1 s1 " + shared, "en", "s", 1),
            (2, "totally unique words here nothing shared at all ok", "en", "s", 1),
        ]
        d = str(tmp_path / "rp")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long"
        ).write.parquet(f"{d}/documents.parquet")

        out = [(r["doc_id"], r["start_pos"], r["end_pos"], r["n_tokens"],
                r["n_dup_grams"])
               for r in QUERIES["repeated_passages"](spark, d).collect()]
        # doc 0: shared starts at token 3 (1-based); doc 1: at token 5
        assert out == [(0, 3, 14, 12, 8), (1, 5, 16, 12, 8)]

    def test_python_replication_sf0001(self, spark):
        """Brute-force replication (dict-of-grams df filter + linear
        island merge in Python) matches every span on the real
        fixture."""
        import re
        from collections import defaultdict

        from autoaudit_spark.llm.text import PASSAGE_GRAM
        from autoaudit_spark.registry import QUERIES
        from autoaudit_spark.sources import load_table

        sf = "/root/testdata/sf0.001"
        docs = {r["doc_id"]: [w.lower() for w in re.split(r"\s+", r["text"].strip())]
                for r in load_table(spark, sf, "documents").collect()}
        where = defaultdict(set)
        for did, toks in docs.items():
            for i in range(len(toks) - PASSAGE_GRAM + 1):
                where[tuple(toks[i:i + PASSAGE_GRAM])].add(did)
        expect = []
        for did in sorted(docs):
            toks = docs[did]
            starts = [i + 1 for i in range(len(toks) - PASSAGE_GRAM + 1)
                      if len(where[tuple(toks[i:i + PASSAGE_GRAM])]) >= 2]
            run = []
            for p in starts:
                if run and p - run[-1] <= PASSAGE_GRAM:
                    run.append(p)
                else:
                    if run:
                        expect.append((did, run[0], run[-1] + PASSAGE_GRAM - 1,
                                       run[-1] + PASSAGE_GRAM - run[0], len(run)))
                    run = [p]
            if run:
                expect.append((did, run[0], run[-1] + PASSAGE_GRAM - 1,
                               run[-1] + PASSAGE_GRAM - run[0], len(run)))
        got = [(r["doc_id"], r["start_pos"], r["end_pos"], r["n_tokens"],
                r["n_dup_grams"])
               for r in QUERIES["repeated_passages"](spark, sf).collect()]
        assert got == expect


class TestSourceOverlap:
    def test_planted_cross_source_dup(self, spark, tmp_path):
        """Sources sa/sb share one document's text verbatim (the
        contamination case); sc is disjoint. Expected per-pair shingle
        overlap computed by an independent Python trigram reference."""
        from itertools import combinations

        from autoaudit_spark.registry import QUERIES

        texts = {
            "sa": ["alpha beta gamma delta epsilon zeta eta theta",
                   "one two three four five six seven"],
            "sb": ["alpha beta gamma delta epsilon zeta eta theta",
                   "red orange yellow green blue indigo violet"],
            "sc": ["lorem ipsum dolor sit amet consectetur adipiscing"],
        }
        rows, i = [], 0
        for src, ts in texts.items():
            for t in ts:
                rows.append((i, t, "en", src, len(t)))
                i += 1
        d = str(tmp_path / "ovl")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")

        def trigrams(t):
            w = t.split()
            return {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}

        sets = {s: set().union(*(trigrams(t) for t in ts))
                for s, ts in texts.items()}
        expect = {}
        for a, b in combinations(sorted(sets), 2):
            n = len(sets[a] & sets[b])
            if n:
                expect[(a, b)] = (
                    n, len(sets[a]), len(sets[b]),
                    round(n / (len(sets[a]) + len(sets[b]) - n), 6),
                )
        got = {(r["src_a"], r["src_b"]):
               (r["n_common"], r["sz_a"], r["sz_b"], r["jaccard"])
               for r in QUERIES["source_overlap_matrix"](spark, d).collect()}
        assert got == expect
        assert ("sa", "sb") in got and got[("sa", "sb")][0] == 6  # shared doc
        assert not any("sc" in k for k in got)  # disjoint source absent

    def test_containment_flags_swallowed_source_jaccard_misses(
        self, spark, tmp_path
    ):
        """The X87 raison d'être: a small dump fully contained in a big
        crawl. Jaccard ≈ |small|/|big| stays low (below any useful
        near-dup threshold) while containment_b_in_a = 1.0 flags the
        swallowed source and NAMES the direction. A partially-
        overlapping pair shows both directions strictly between."""
        from autoaudit_spark.registry import QUERIES

        # big: one long doc (many trigrams); small: a verbatim slice
        big_words = [f"w{i}" for i in range(80)]
        big = " ".join(big_words)
        small = " ".join(big_words[10:16])        # 4 trigrams, all in big
        partial = " ".join(big_words[70:80] + ["extra", "tail", "words"])
        rows = [
            (0, big, "en", "crawl", len(big)),
            (1, small, "en", "dump", len(small)),
            (2, partial, "en", "mixed", len(partial)),
        ]
        d = str(tmp_path / "cont")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")

        got = {(r["src_a"], r["src_b"]): r
               for r in QUERIES["source_containment_matrix"](spark, d)
               .collect()}
        r = got[("crawl", "dump")]
        # 78 trigrams in big, 4 in small, all 4 shared
        assert (r["n_common"], r["sz_a"], r["sz_b"]) == (4, 78, 4)
        assert r["containment_b_in_a"] == 1.0          # dump ⊆ crawl
        assert r["jaccard"] < 0.06                     # Jaccard blind
        assert r["containment_a_in_b"] == round(4 / 78, 6)
        p = got[("crawl", "mixed")]
        assert 0 < p["containment_b_in_a"] < 1.0       # partial overlap
        assert 0 < p["containment_a_in_b"] < p["containment_b_in_a"]

    def test_containment_consistent_with_overlap_matrix(self, spark, sf_dir):
        """Pure-composition invariant on the real fixture: every X87
        row must reproduce its X84 row exactly, and the containment
        columns must equal the pinned divisions of its integers."""
        from autoaudit_spark.registry import QUERIES

        base = {(r["src_a"], r["src_b"]): r
                for r in QUERIES["source_overlap_matrix"](spark, sf_dir)
                .collect()}
        cont = {(r["src_a"], r["src_b"]): r
                for r in QUERIES["source_containment_matrix"](spark, sf_dir)
                .collect()}
        assert base.keys() == cont.keys()
        for k, r in cont.items():
            b = base[k]
            assert (r["n_common"], r["sz_a"], r["sz_b"], r["jaccard"]) == (
                b["n_common"], b["sz_a"], b["sz_b"], b["jaccard"])
            assert r["containment_a_in_b"] == round(
                r["n_common"] / r["sz_a"], 6)
            assert r["containment_b_in_a"] == round(
                r["n_common"] / r["sz_b"], 6)

    def test_minhash_identical_sources_estimate_one(self, spark, tmp_path):
        """Two sources with IDENTICAL shingle unions must agree on all
        64 permutation minima → n_match = 64, est_jaccard = 1.0."""
        from autoaudit_spark.registry import QUERIES

        t1 = "alpha beta gamma delta epsilon zeta"
        t2 = "one two three four five six"
        rows = [
            (0, t1, "en", "sx", len(t1)), (1, t2, "en", "sx", len(t2)),
            (2, t1, "en", "sy", len(t1)), (3, t2, "en", "sy", len(t2)),
            (4, "totally different words here now", "en", "sz", 33),
        ]
        d = str(tmp_path / "ovm")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {(r["src_a"], r["src_b"]): (r["n_match"], r["est_jaccard"])
               for r in QUERIES["source_overlap_minhash"](spark, d).collect()}
        assert got[("sx", "sy")] == (64, 1.0)

    def test_minhash_estimate_tracks_exact(self, spark, sf_dir):
        """The estimate must sit inside MinHash sampling error of the
        exact X84 matrix on the real fixture (measured r9: max |Δ|
        0.065, mean 0.016 at sf0.001/sf0.01 — thresholds carry ~2×
        margin while still far below the 0.3-wide jaccard spread)."""
        from autoaudit_spark.registry import QUERIES

        exact = {(r["src_a"], r["src_b"]): r["jaccard"]
                 for r in QUERIES["source_overlap_matrix"](spark, sf_dir).collect()}
        est = {(r["src_a"], r["src_b"]): r["est_jaccard"]
               for r in QUERIES["source_overlap_minhash"](spark, sf_dir).collect()}
        assert set(est) <= set(exact)
        diffs = [abs(est.get(k, 0.0) - v) for k, v in exact.items()]
        assert max(diffs) <= 0.15
        assert sum(diffs) / len(diffs) <= 0.05


class TestSourceContainmentMinhash:
    """Pre-built r12/r13 birth candidate (NOT yet registered — the r11
    window-capacity note defers the `@query` line to the next free
    slot): the signature-only containment estimate. These tests drive
    the function and its oracle SQL directly, so the future
    registration is a one-line change with evidence already standing."""

    def test_identical_sources_estimate_exactly_one(self, spark, tmp_path):
        """Identical shingle unions → all 64 minima agree → est_J = 1
        and the inclusion-exclusion estimate collapses EXACTLY:
        64·(sz+sz)/((64+64)·sz) = 1.0 both directions."""
        from autoaudit_spark.llm.dedup import source_containment_minhash

        t1 = "alpha beta gamma delta epsilon zeta"
        t2 = "one two three four five six"
        rows = [
            (0, t1, "en", "sx", len(t1)), (1, t2, "en", "sx", len(t2)),
            (2, t1, "en", "sy", len(t1)), (3, t2, "en", "sy", len(t2)),
        ]
        d = str(tmp_path / "cmh1")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {(r["src_a"], r["src_b"]): r
               for r in source_containment_minhash(spark, d).collect()}
        r = got[("sx", "sy")]
        assert r["n_match"] == 64
        assert r["est_containment_a_in_b"] == 1.0
        assert r["est_containment_b_in_a"] == 1.0

    def test_flags_swallowed_source_directionally(self, spark, tmp_path):
        """The X87 fixture through the estimator: dump ⊆ crawl. The
        direction ratio est_b_in_a / est_a_in_b = sz_a/sz_b holds for
        ANY n_match (both estimates share the n·(sz_a+sz_b) numerator),
        so the swallowed side is named regardless of sampling noise;
        the magnitudes use the deterministic portable hash, so the
        planted value is stable."""
        from autoaudit_spark.llm.dedup import source_containment_minhash

        big_words = [f"w{i}" for i in range(80)]
        big = " ".join(big_words)
        small = " ".join(big_words[10:16])        # 4 trigrams, all in big
        rows = [
            (0, big, "en", "crawl", len(big)),
            (1, small, "en", "dump", len(small)),
        ]
        d = str(tmp_path / "cmh2")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        got = {(r["src_a"], r["src_b"]): r
               for r in source_containment_minhash(spark, d).collect()}
        r = got[("crawl", "dump")]
        assert (r["sz_a"], r["sz_b"]) == (78, 4)
        assert r["est_jaccard"] < 0.15              # Jaccard stays blind
        # direction: the small source is the swallowed one, by sz ratio
        assert r["est_containment_b_in_a"] == round(
            r["est_containment_a_in_b"] * 78 / 4, 6
        ) or r["est_containment_b_in_a"] > 10 * r["est_containment_a_in_b"]
        assert r["est_containment_b_in_a"] > 0.5

    def test_oracle_cross_engine_exact(self, spark, sf_dir):
        """Spark vs DuckDB on the real sf0.001 documents — every typed
        column equal (the pre-registration value-hash evidence: the
        pinned single divisions and the dyadic est_jaccard are
        hash-stable cross-engine)."""
        import duckdb

        from autoaudit_spark.llm.dedup import (
            _source_containment_minhash_sql,
            source_containment_minhash,
        )

        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        expect = con.execute(_source_containment_minhash_sql()).fetchall()
        got = [
            (r["src_a"], r["src_b"], r["n_match"], r["sz_a"], r["sz_b"],
             r["est_jaccard"], r["est_containment_a_in_b"],
             r["est_containment_b_in_a"])
            for r in source_containment_minhash(spark, sf_dir).collect()
        ]
        assert got == expect
        assert got, "fixture must produce a nonvacuous matrix"

    def test_estimate_tracks_exact_containment(self, spark, sf_dir):
        """The estimate must sit inside MinHash sampling error of the
        exact X87 containment on the real fixture (measured end-r10 at
        sf0.01: max |Δ| 0.115, median 0.016 over 148 pairs — the 0.2
        threshold carries ~2× margin)."""
        from autoaudit_spark.llm.dedup import source_containment_minhash
        from autoaudit_spark.registry import QUERIES

        exact = {}
        for r in QUERIES["source_containment_matrix"](spark, sf_dir).collect():
            exact[(r["src_a"], r["src_b"])] = (
                r["containment_a_in_b"], r["containment_b_in_a"])
        est = {(r["src_a"], r["src_b"]):
               (r["est_containment_a_in_b"], r["est_containment_b_in_a"])
               for r in source_containment_minhash(spark, sf_dir).collect()}
        common = set(est) & set(exact)
        assert common
        diffs = [abs(est[k][i] - exact[k][i]) for k in common for i in (0, 1)]
        assert max(diffs) <= 0.2
        assert sorted(diffs)[len(diffs) // 2] <= 0.05  # median


class TestSourceOverlapProperty:
    """Hypothesis: random small corpora through the documents seam —
    X84 against a pure-Python set reference and X85 against a BITWISE
    pure-Python replication of the portable hash + affine-permutation
    MinHash (the X80 replication tier: the same integers, not a
    tolerance)."""

    @staticmethod
    def _write_docs(spark, tmp_path, corpora, tag):
        import itertools as it

        rows, i = [], 0
        for src, docs in sorted(corpora.items()):
            for t in docs:
                rows.append((i, t, "en", src, len(t)))
                i += 1
        d = str(tmp_path / f"ovp{tag}")
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.parquet(f"{d}/documents.parquet")
        return d

    @staticmethod
    def _shingle_set(docs):
        out = set()
        for t in docs:
            w = t.split()
            out |= {" ".join(w[j:j + 3]) for j in range(len(w) - 2)}
        return out

    def test_exact_and_minhash_match_python(self, spark, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from autoaudit_spark.llm.dedup import (
            MINHASH_PERMS,
            _A,
            _B,
            _P,
        )
        from autoaudit_spark.registry import QUERIES

        word = st.sampled_from(
            ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
        )
        doc = st.lists(word, min_size=3, max_size=9).map(" ".join)
        corpora_st = st.dictionaries(
            st.sampled_from(["sa", "sb", "sc"]),
            st.lists(doc, min_size=1, max_size=3),
            min_size=2,
            max_size=3,
        )

        counter = [0]

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(corpora=corpora_st)
        def run(corpora):
            from itertools import combinations

            counter[0] += 1
            d = self._write_docs(spark, tmp_path, corpora, counter[0])
            sets = {s: self._shingle_set(ds) for s, ds in corpora.items()}

            # X84 reference
            expect84 = {}
            for a, b in combinations(sorted(sets), 2):
                n = len(sets[a] & sets[b])
                if n:
                    expect84[(a, b)] = (
                        n, len(sets[a]), len(sets[b]),
                        round(n / (len(sets[a]) + len(sets[b]) - n), 6),
                    )
            got84 = {(r["src_a"], r["src_b"]):
                     (r["n_common"], r["sz_a"], r["sz_b"], r["jaccard"])
                     for r in QUERIES["source_overlap_matrix"](
                         spark, d).collect()}
            assert got84 == expect84

            # X85 reference — bitwise hash + permutation replication
            def arith(sh):
                h = 0
                for ch in sh:
                    h = (h * 131 + ord(ch)) % 1000000007
                return h

            sigs = {}
            for s, shs in sets.items():
                hs = [arith(x) % _P for x in shs]
                if hs:
                    sigs[s] = [
                        min((_A[i] * h + _B[i]) % _P for h in hs)
                        for i in range(MINHASH_PERMS)
                    ]
            expect85 = {}
            for a, b in combinations(sorted(sigs), 2):
                m = sum(1 for i in range(MINHASH_PERMS)
                        if sigs[a][i] == sigs[b][i])
                if m >= 1:
                    expect85[(a, b)] = (m, m / MINHASH_PERMS)
            got85 = {(r["src_a"], r["src_b"]):
                     (r["n_match"], r["est_jaccard"])
                     for r in QUERIES["source_overlap_minhash"](
                         spark, d).collect()}
            assert got85 == expect85

        run()


class TestSourceContainmentMinhashProperty:
    """Hypothesis: random small corpora through the documents seam —
    X91 against a BITWISE pure-Python replication of the whole
    estimate chain (hash, permutations, match count, exact sizes,
    clamped inclusion-exclusion, and Spark's BigDecimal-HALF_UP
    6dp round via Decimal(repr(x))) — the X80/X85 replication tier:
    the same integers and the same doubles, not a tolerance."""

    def test_containment_matches_python(self, spark, tmp_path):
        from decimal import Decimal, ROUND_HALF_UP

        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from autoaudit_spark.llm.dedup import (
            MINHASH_PERMS,
            _A,
            _B,
            _P,
            source_containment_minhash,
        )

        word = st.sampled_from(
            ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
        )
        doc = st.lists(word, min_size=3, max_size=9).map(" ".join)
        corpora_st = st.dictionaries(
            st.sampled_from(["sa", "sb", "sc"]),
            st.lists(doc, min_size=1, max_size=3),
            min_size=2,
            max_size=3,
        )

        def half_up6(x):
            # Spark round(double, 6) = BigDecimal.valueOf(x) (shortest
            # repr, same as Python repr) .setScale(6, HALF_UP)
            return float(
                Decimal(repr(x)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )

        def arith(sh):
            h = 0
            for ch in sh:
                h = (h * 131 + ord(ch)) % 1000000007
            return h

        counter = [0]

        @settings(
            max_examples=8,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(corpora=corpora_st)
        def run(corpora):
            from itertools import combinations

            counter[0] += 1
            d = TestSourceOverlapProperty._write_docs(
                spark, tmp_path, corpora, f"cm{counter[0]}"
            )
            sets = {
                s: TestSourceOverlapProperty._shingle_set(ds)
                for s, ds in corpora.items()
            }

            sz, sigs = {}, {}
            for s, shs in sets.items():
                hset = {arith(x) for x in shs}  # sz = DISTINCT shash
                if hset:
                    sz[s] = len(hset)
                    hs = [h % _P for h in hset]
                    sigs[s] = [
                        min((_A[i] * h + _B[i]) % _P for h in hs)
                        for i in range(MINHASH_PERMS)
                    ]

            expect = {}
            for a, b in combinations(sorted(sigs), 2):
                m = sum(
                    1
                    for i in range(MINHASH_PERMS)
                    if sigs[a][i] == sigs[b][i]
                )
                if m >= 1:
                    est_common = min(
                        float(m * (sz[a] + sz[b])) / (MINHASH_PERMS + m),
                        float(min(sz[a], sz[b])),
                    )
                    expect[(a, b)] = (
                        m, sz[a], sz[b], m / MINHASH_PERMS,
                        half_up6(est_common / sz[a]),
                        half_up6(est_common / sz[b]),
                    )
            got = {
                (r["src_a"], r["src_b"]): (
                    r["n_match"], r["sz_a"], r["sz_b"], r["est_jaccard"],
                    r["est_containment_a_in_b"],
                    r["est_containment_b_in_a"],
                )
                for r in source_containment_minhash(spark, d).collect()
            }
            assert got == expect

        run()

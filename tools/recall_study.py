"""ANN recall study: recall@10 vs exact cosine for every index family, on
(a) the driver's near-uniform synthetic embeddings (the ANN-hard case) and
(b) a clustered mixture-of-Gaussians fixture (the regime a real embedding
corpus sits in). Results feed BASELINE.md §2c.

Usage:
    python tools/recall_study.py [sf_dir]     # default /root/testdata/sf0.01

The clustered fixture is generated deterministically (seed below) into a
temp dir with the exact testdata embeddings schema (vec_id BIGINT,
embedding FLOAT[], label INT), so every similarity operator runs on it
unchanged — label doubles as the IVF cell id, which on clustered data is
exactly the "cells align with cosine neighborhoods" property a trained
coarse quantizer would give.
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 30
K = 10

CLUSTER_SEED = 7
CLUSTER_N, CLUSTER_DIM, CLUSTER_K = 500, 64, 10
CLUSTER_NOISE = 0.15  # within-cluster sigma vs unit-ish centers


def make_clustered_fixture(out_dir: str) -> str:
    """Deterministic mixture-of-Gaussians embeddings.parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rs = np.random.RandomState(CLUSTER_SEED)
    centers = rs.normal(0.0, 1.0, (CLUSTER_K, CLUSTER_DIM))
    labels = rs.randint(0, CLUSTER_K, CLUSTER_N)
    vecs = centers[labels] + rs.normal(0.0, CLUSTER_NOISE, (CLUSTER_N, CLUSTER_DIM))
    table = pa.table(
        {
            "vec_id": pa.array(range(CLUSTER_N), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.tolist(), pa.int32()),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(table, os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


def hybrid_relevance_fixture(noise: float, seed: int = 11):
    """Planted-relevance corpus for the hybrid-RRF recall attestation
    (VERDICT r12 #6): 16 RELEVANT docs split into 8 lexical-only (contain
    the query terms, random embeddings — the vector leg cannot see them)
    and 8 semantic-only (paraphrase text without the terms, embeddings
    near the query vector — the lexical leg cannot see them), plus 83
    distractors with neither signal. Doc 0 is the query document (terms
    + centroid embedding). Each leg can retrieve at most half of R by
    construction; only the fusion can approach full recall. ``noise``
    is the semantic cluster's sigma — the second regime checks the claim
    survives a looser embedding geometry. Shared with
    test_hybrid_rrf_fused_beats_each_leg, which PINS fused >= max(leg)."""
    rs = np.random.RandomState(seed)
    dim, n = 64, 100
    terms = ("quantum", "flux", "lattice")
    filler = [f"w{i}" for i in range(50)]
    para = [f"p{i}" for i in range(20)]  # paraphrase vocab, no terms
    center = rs.normal(0.0, 1.0, dim)

    def rand_text(k=30):
        return " ".join(rs.choice(filler, k))

    docs, embs = [], []
    for i in range(n):
        if i == 0:  # the query document
            text = " ".join(terms) + " " + rand_text(10)
            v = center.copy()
        elif 1 <= i <= 8:  # lexical-only relevant
            text = " ".join(rs.choice(list(terms), 3)) + " " + rand_text(20)
            v = rs.normal(0.0, 1.0, dim)  # embedding carries no signal
        elif 9 <= i <= 16:  # semantic-only relevant
            text = " ".join(rs.choice(para, 30))  # no query terms
            v = center + rs.normal(0.0, noise, dim)
        else:  # distractor
            text = rand_text(30)
            v = rs.normal(0.0, 1.0, dim)
        docs.append((i, text))
        embs.append((i, [float(x) for x in v.astype(np.float32)]))
    relevant = set(range(1, 17))
    return docs, embs, terms, relevant


def hybrid_study(spark) -> list[tuple[str, str, float]]:
    """recall@RRF_TOP_K of each retrieval leg alone vs the RRF fusion on
    the planted-relevance fixture, at a tight and a loose semantic-noise
    regime. Feeds BASELINE.md §2c."""
    from pinterest_data_pipeline218_spark.operators.ranking import (
        RRF_TOP_K,
        hybrid_rrf,
        rrf_lex_pool,
        rrf_vec_pool,
    )

    out = []
    for regime, noise in (("tight (sigma 0.15)", 0.15), ("loose (sigma 0.5)", 0.5)):
        doc_rows, emb_rows, terms, relevant = hybrid_relevance_fixture(noise)
        docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
        emb = spark.createDataFrame(
            emb_rows, "vec_id long, embedding array<float>"
        )

        def recall(ids):
            return len(set(ids) & relevant) / len(relevant)

        lex = [
            r.doc_id
            for r in rrf_lex_pool(docs, terms)
            .orderBy("lex_rank").limit(RRF_TOP_K).collect()
        ]
        vec = [
            r.doc_id
            for r in rrf_vec_pool(emb, 0)
            .orderBy("vec_rank").limit(RRF_TOP_K).collect()
        ]
        fused = [r.doc_id for r in hybrid_rrf(docs, emb, terms, 0).collect()]
        out.append((regime, "BM25 leg alone", recall(lex)))
        out.append((regime, "cosine leg alone", recall(vec)))
        out.append((regime, "RRF fused", recall(fused)))
    return out


def _truth(mat: np.ndarray, qid: int) -> set[int]:
    q = mat[qid]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q) + 1e-300)
    order = sorted(range(len(mat)), key=lambda i: (-sims[i], i))
    return set([i for i in order if i != qid][:K])


def study(spark, sf_dir: str, tag: str) -> list[tuple[str, str, float, str]]:
    from pinterest_data_pipeline218_spark.data import load_table
    from pinterest_data_pipeline218_spark.functions.vectors import as_double_array
    from pinterest_data_pipeline218_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    rows = emb.orderBy("vec_id").collect()
    mat = np.array([list(r.v) for r in rows], dtype=np.float64)
    by_id = {r.vec_id: list(r.v) for r in rows}
    n = len(rows)
    qids = list(range(0, n, max(1, n // N_QUERIES)))[:N_QUERIES]
    truths = {qid: _truth(mat, qid) for qid in qids}

    base = os.path.join(tempfile.gettempdir(), f"recall_study_{tag}")
    ann_path, ivf_path, pq_path = (
        os.path.join(base, d) for d in ("ann", "ivf", "pq")
    )
    S.write_ann_index(emb.select("vec_id", "v"), ann_path)
    S.write_ivf_index(emb, ivf_path)
    S.write_pq_index(emb, pq_path)

    def recall(fn) -> float:
        hit = 0
        for qid in qids:
            got = {r.vec_id for r in fn(qid).collect()}
            hit += len(got & truths[qid])
        return hit / (K * len(qids))

    out = []
    for r in (0, 1, 2):
        out.append(
            (
                "LSH (8 hyperplanes)" if r == 0 else "LSH multiprobe",
                f"Hamming radius {r}",
                recall(
                    lambda q, _r=r: S.ann_index_topk(
                        spark, ann_path, query_vec_id=q, hamming_radius=_r
                    )
                ),
                f"~{len(S._hamming_probe_buckets(0, r))}/256",
            )
        )
    for npb in (1, 2, 4, 8):
        out.append(
            (
                "IVF (10 cells)" if npb == 1 else "IVF",
                f"nprobe {npb}",
                recall(
                    lambda q, _n=npb: S.ivf_index_topk(
                        spark,
                        ivf_path,
                        query_vec=by_id[q],
                        exclude_vec_id=q,
                        nprobe=_n,
                    )
                ),
                f"~{npb}/10",
            )
        )
    out.append(
        (
            "PQ (global 16-entry codebooks)",
            "full scan, 4-bit codes",
            recall(
                lambda q: S.pq_index_topk(
                    spark, pq_path, by_id[q], exclude_vec_id=q
                )
            ),
            "all (codes only)",
        )
    )
    out.append(
        (
            "IVF-PQ",
            f"nprobe {S.NPROBE}",
            recall(
                lambda q: S.pq_index_topk(
                    spark, pq_path, by_id[q], nprobe=S.NPROBE, exclude_vec_id=q
                )
            ),
            f"~{S.NPROBE}/10 (codes only)",
        )
    )
    out.append(
        (
            "IVF-PQ residual",
            f"nprobe {S.NPROBE}",
            recall(lambda q: S._ivfpq_residual(emb, q, nprobe=S.NPROBE)),
            f"~{S.NPROBE}/10 (codes only)",
        )
    )
    out.append(
        (
            "IVF-PQ residual + Lloyd",
            f"nprobe {S.NPROBE}, {S.PQ_LLOYD_ROUNDS} rounds",
            recall(
                lambda q: S._ivfpq_residual(
                    emb, q, nprobe=S.NPROBE, lloyd_rounds=S.PQ_LLOYD_ROUNDS
                )
            ),
            f"~{S.NPROBE}/10 (codes only)",
        )
    )
    out.append(
        (
            "IVF-PQ residual WIDE",
            f"nprobe {S.NPROBE}, 8-bit codes (K={S.PQ_K_WIDE})",
            recall(
                lambda q: S._ivfpq_residual(
                    emb, q, nprobe=S.NPROBE, pq_k=S.PQ_K_WIDE
                )
            ),
            f"~{S.NPROBE}/10 (codes only, 2x code bytes)",
        )
    )
    return out


def main():
    from pinterest_data_pipeline218_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    clustered = make_clustered_fixture(
        os.path.join(tempfile.gettempdir(), "recall_clustered_fixture")
    )
    for tag, d in (("synthetic", sf_dir), ("clustered", clustered)):
        print(f"\n### {tag} ({d})", flush=True)
        print("| family | dial | recall@10 | corpus scanned |")
        print("|---|---|---|---|")
        for fam, dial, rec, cost in study(spark, d, tag):
            print(f"| {fam} | {dial} | {rec:.3f} | {cost} |", flush=True)

    print("\n### hybrid RRF (planted-relevance fixture, recall@20)", flush=True)
    print("| regime | retriever | recall@20 |")
    print("|---|---|---|")
    for regime, retr, rec in hybrid_study(spark):
        print(f"| {regime} | {retr} | {rec:.3f} |", flush=True)


if __name__ == "__main__":
    main()

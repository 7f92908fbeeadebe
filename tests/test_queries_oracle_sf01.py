"""Scale-transition parity: a curated slice of the registry re-checked
against DuckDB at sf0.1 (10× the driver's correctness gate). Plan shapes
legitimately CHANGE at this size — broadcast joins cross the autoThreshold
into sort-merge, AQE re-coalesces, bucket caps and skew paths start firing
— and a query can be hash-green at sf0.01 while a scale-dependent branch
(wrong join side, lost rows at the broadcast→SMJ switch, a cap that
truncates results) only shows at sf0.1. The slice picks one query per
plan-shape family rather than re-running all 105.
"""

from __future__ import annotations

import os

import pytest

from osmesa_spark import queries as Q
from tests.oracle_utils import compare_spark_duckdb

SF_01 = "/root/testdata/sf0.1"

# one representative per family whose PHYSICAL shape is size-dependent:
#   minhash_lsh_pairs    — banded self-join + degenerate-bucket cap
#   dedup_components     — iterative star kernel over LSH output
#   doc_dedup_spans      — gram-keyed shuffle + checkpoint subtree
#   osm_changeset_stats  — multi-way outer joins over dims that outgrow
#                          the broadcast threshold
#   knn_pq               — literal-fold encode over a corpus 10× the
#                          trained fixture
#   mixture_sample       — rates derived from counts (counts change w/ SF)
#   cms_heavy_users      — collision density shifts with corpus size
SCALE_SLICE = [
    "minhash_lsh_pairs",
    "dedup_components",
    "doc_dedup_spans",
    "osm_changeset_stats",
    "knn_pq",
    "mixture_sample",
    "cms_heavy_users",
    # learned artifacts change with corpus size: the merge table / the
    # derived mixture rates / pack shards must re-derive identically
    "doc_bpe_train",
    "corpus_curation_app",
    "knn_ivfpq",
    # r6: band-collision density and dup-cluster topology both shift with
    # corpus size — the banded phash join and the full near-dup chain
    # (LSH → verify → components → per-cluster argmax) re-verify at 10×
    "multimodal_phash_pairs",
    "neardup_dedup_app",
    # r7: the Hamming-shortlist window's rank boundary and the quadtree
    # address-depth distribution both move with corpus size
    # (osm_way_tile_cover is fixture-driven — no scale axis — so it is
    # NOT in this slice)
    "knn_binary_rerank",
    "bm_quadtree_partition",
    # r8: duplicate-paragraph and duplicate-window density both grow with
    # corpus size (more cross-doc collisions, longer merged intervals),
    # and the DSIR fits re-derive from 10× the token mass — all three must
    # re-verify where the count≥2 topology actually changes
    "doc_paragraph_dedup",
    "doc_dedup_spans_char",
    "dsir_weights",
    # r8: the learned LR weights re-derive from 10× the gradient mass —
    # the integer-exact gradient + 9dp step discipline must hold where
    # float sums would actually diverge
    "doc_lr_quality",
    # r9: the FROZEN train/serve split — the ratio/weights fit on the
    # doc_id%2 train half while serving covers the whole corpus, so the
    # train/serve asymmetry (and the intake chain's gate+dedup+threshold
    # composition) re-verifies where the two sides actually diverge
    "lr_score_frozen",
    "intake_accepted_batch",
    # r9: the two-phase salted top-K — bucket occupancy and the phase-2
    # survivor count both shift with corpus size
    "source_doc_cap_topk",
    # r9 second batch: cross-doc window-hash density (eval-overlap
    # topology changes with corpus size), the word-keyed source-pair
    # self-join (vocab and per-word source fan both grow), the NLL-chain
    # reweighting (bigram mass 10×, exact-integer accumulator must hold),
    # and the bucket-blocked density census (bucket occupancy grows
    # linearly -> the Σ|bucket|² join surface actually shifts)
    "decontaminate_spans_char",
    "source_js_divergence",
    "domain_reweight_nll",
    "embedding_density",
    # r9 third batch: bucket occupancy (the vote census) and the trained
    # coarse centroids both re-derive from a 10× corpus — the probe
    # selection and majority votes must replay identically at scale
    "knn_label_accuracy",
    "knn_ivf_nprobe",
    # r10: the de-weaked global percentile — the quality-histogram
    # cumulative, the tie-group row_number re-assembly AND the GK grid
    # breakpoints all re-derive from a 10× corpus (more distinct 4dp
    # scores, bigger tie-groups, shifted quantiles); the
    # percentile_approx ≡ quantile_disc degenerate-accuracy contract
    # must hold at the larger n
    "quality_source_norm",
]


@pytest.fixture(scope="module")
def duck01():
    import duckdb

    from tests.conftest import TABLES

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_01, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", SCALE_SLICE)
def test_scale_slice_matches_oracle_at_sf01(spark, duck01, name):
    spec = Q.registry()[name]
    df = spec.spark(spark, SF_01)
    res = compare_spark_duckdb(df, duck01, spec.oracle)
    assert res["schema_match"], f"{name}: {res['spark_cols']} vs {res['duck_cols']}"
    assert res["rows_match"], f"{name}: rows {res['spark_rows']} vs {res['duck_rows']}"
    assert res["values_match"], f"{name}: first diffs {res.get('first_diffs')}"

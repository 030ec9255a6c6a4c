"""Driver contract for the spark-graft builder (PySpark target).

The engine under test is `parquet_go_spark` — a from-scratch PySpark-native
per-column lightweight-compression engine re-creating hangxie/parquet-go's
encoding layer (SURVEY.md §2). Queries fall into three families:

  rt_*      encode->decode roundtrips through the engine's codecs on the
            driver tables — the distributed analog of the reference's
            write->read->equal tests; the oracle is plain SELECT, so a
            value-hash match proves bit-identity.
  stats_*   column statistics computed by the encode kernel's chunk-stats
            folding (reference chunk.go:50-122).
  prune_*   pruned reads through the blob store: manifest [vmin,vmax]
            range pruning (ColumnIndex analog) and split-block-bloom
            point lookups (BloomFilterCheck analog); exact post-filter
            makes the oracle comparison exact.
  mm_*      multimodal binary columns: typed metadata, feature
            extraction, decode/resize/frame-sample plumbing.
  dedup_* / text_* / sim_*   training-data pipeline operators over the
            documents/embeddings tables (dedup, text analysis, similarity).

Non-SQL-expressible entries (engine-internal manifests, LSH with
engine-specific hashes) intentionally omit oracle_sql -> rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parquet_go_spark.operators import dedup as _dedup
from parquet_go_spark.operators import multimodal as _mm
from parquet_go_spark.operators import pruned as _pruned
from parquet_go_spark.operators import roundtrip as _rt
from parquet_go_spark.operators import similarity as _sim
from parquet_go_spark.operators import sketch as _sketch
from parquet_go_spark.operators import text as _text

LINEITEM_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate",
]
NUM_LINEITEM = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode the documents table through the full codec stack and
    return the decoded rows (driver checks rows>0, stable schema)."""
    q = _rt.roundtrip_query(
        "documents",
        codec_map={"text": "fsst", "lang": "dict", "source": "dict",
                   "doc_id": "delta_binary_packed"},
    )
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registration order is deliberate: the driver gate evaluates a
    50-query prefix, so each round rotates the least-recently-driver-
    checked queries to the front (the round-4 verdict's task #1).
    Round 5's window = the 14 queries that have NEVER had a driver
    CORRECTNESS row (the round-3/4 real-parquet long tail: pq_map/
    migration/struct/embeddings/pruned/pages/encrypted/logical/variant/
    geo + text_tokenize/text_postings/bpe_encode), then the 5 queries
    last checked in round 1, then 31 representatives of the round-2
    families covering every distinct logical-type and codec path. The
    ds_/prune_/pq sentinel families (all r4 hash-green) trail; they
    keep oracle evidence via tools/check_correctness.py full sweeps.
    The physical ordering below is unchanged from round 4 — the window
    is imposed by _GATE_WINDOW at the end."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    from parquet_go_spark.operators import asof as _asof
    from parquet_go_spark.operators import bpe as _bpe
    from parquet_go_spark.operators import changes as _chg
    from parquet_go_spark.operators import classifier as _clf
    from parquet_go_spark.operators import contamination as _con
    from parquet_go_spark.operators import curation as _cur
    from parquet_go_spark.operators import dsir as _dsir
    from parquet_go_spark.operators import keywords as _kw
    from parquet_go_spark.operators import packing as _pack
    from parquet_go_spark.operators import partspec as _psp
    from parquet_go_spark.operators import postings as _post
    from parquet_go_spark.operators import rangejoin as _rj
    from parquet_go_spark.operators import retrieval as _ret
    from parquet_go_spark.operators import sessions as _sess
    from parquet_go_spark.operators import tokenize as _tokz
    from parquet_go_spark.sources import pgs_datasource as _ds

    # --- native Spark source: spark.read/write.format("pgs") ---
    q["ds_pruned_read"] = _ds.ds_pruned_read_query
    q["ds_write_roundtrip"] = _ds.ds_write_roundtrip_query
    # manifest-only aggregates (Iceberg aggregate-pushdown analog):
    # count/min/max answered from chunk metadata, zero blob reads
    q["stats_agg_manifest"] = _ds.stats_agg_manifest_query
    q["stats_ndv_manifest"] = _ds.stats_ndv_manifest_query
    # shredded-variant store: typed chunks on write, transparent
    # reconstruction on read (reference marshal/variant_reconstruct.go)
    q["ds_variant_shredded"] = _ds.ds_variant_shredded_query
    # row-level deletes: merge-on-read tombstones, then materialized via
    # compaction (Iceberg positional-delete analog; no reference analog —
    # parquet-go files are immutable)
    q["ds_delete_read"] = _ds.ds_delete_read_query
    q["ds_delete_compact"] = _ds.ds_delete_compact_query
    # schema evolution: drop/add(default)/rename, appends under the
    # evolved schema, per-partition alias resolution on read
    q["ds_schema_evolution"] = _ds.ds_schema_evolution_query
    # MERGE by key: semi-join tombstones + append (upsert_by_key)
    q["ds_upsert"] = _ds.ds_upsert_query
    # equality deletes: key-value delete files, scan-free takedown,
    # read-time anti-join scoped by part-id cap (Iceberg eq-delete analog)
    q["ds_eq_delete"] = _ds.ds_eq_delete_query
    # UPDATE ... SET: tombstone-old + append-new with expressions over
    # the old row values (completes the DML triad)
    q["ds_update"] = _ds.ds_update_query
    # snapshot rollback: durable as_of_commit (bad append undone;
    # part ids never reused — tombstones/eq-caps stay exact)
    q["ds_rollback"] = _ds.ds_rollback_query
    # the store consumed as a stream: commits -> micro-batches
    q["ds_stream_source"] = _ds.ds_stream_source_query
    # write-audit-publish: staged branch appends invisible to main
    # until publish; dropped branches never surface
    q["ds_branch_wap"] = _ds.ds_branch_wap_query
    # conditional MERGE INTO: matched update over old values +
    # unmatched insert, one source, one append
    q["ds_merge"] = _ds.ds_merge_query
    # rewrite with a sort order: one range shuffle -> disjoint key
    # bounds per partition (exact-range stats pruning)
    q["ds_recluster"] = _ds.ds_recluster_query
    # typed-field projection of a shredded variant: one typed chunk,
    # no reconstruction (strictly typed semantics)
    q["ds_shred_project"] = _ds.ds_shred_project_query
    # changelog read (Iceberg CDC analog): window inserts + delete-
    # address events; since_commit completed with delete visibility
    q["ds_changes_feed"] = _chg.ds_changes_feed_query

    # --- pruned reads (ColumnIndex / bloom / partition-spec analogs) ---
    # Iceberg hidden partitioning: transform-spec pruning from meta alone
    q["prune_hidden_partition"] = _psp.hidden_partition_query
    # intra-chunk page pruning over the manifest's per-page index
    q["prune_pages"] = _pruned.page_pruned_range_query
    # 2-D box on a z-order-clustered store: stats prune on BOTH columns
    q["prune_zorder"] = _pruned.zorder_pruned_box_query
    # GEOMETRY column: WKB through the codec stack, GeospatialStatistics
    # bbox pruning from the manifest (types/geospatial.go analog)
    q["prune_geo_bbox"] = _pruned.geo_pruned_bbox_query
    # element blooms on an array column: token/word membership probe
    q["prune_token_bloom"] = _pruned.token_membership_query
    q["prune_stats_range"] = _pruned.stats_pruned_range_query
    q["prune_bloom_point"] = _pruned.bloom_pruned_point_query

    # --- sketch family ---
    # HyperLogLog distinct sketch, pure relational (no Python in the
    # data path); oracle re-derives Spark's xxhash64 in DuckDB SQL
    q["stats_hll_distinct"] = _sketch.hll_distinct_query
    # count-min frequency sketch (d=4 x w=8192 counters), same contract
    q["stats_cms_freq"] = _sketch.cms_topk_query
    # exact distributed quantiles (groupBy counts + distributed prefix
    # sum; no single-partition window); integer-rank oracle
    q["stats_quantiles"] = _sketch.quantiles_query

    # --- relational operators Spark lacks natively ---
    # as-of join (state lookup per key/time; DuckDB ASOF JOIN oracle)
    q["join_asof"] = _asof.join_asof_query
    # pure range join via bucketized equi-join (no nested loop)
    q["join_range"] = _rj.join_range_query
    # gap-based sessionization (one shuffle, lag + running cumsum)
    q["sessionize"] = _sess.sessionize_query

    # --- tokenizer / retrieval / selection pipeline ---
    # vocab training + tokenization, and the engine roundtrip on the
    # learned tokens
    q["tokenize_encode_roundtrip"] = _tokz.tokenize_encode_roundtrip_query
    q["postings_encode_roundtrip"] = _post.postings_encode_roundtrip_query
    q["text_keywords"] = _kw.text_keywords_query
    # BM25 top-k retrieval (rational idf; bit-exact cross-engine scoring)
    q["text_bm25"] = _ret.text_bm25_query
    # distributed BPE merge training + application + engine roundtrip
    q["bpe_train"] = _bpe.bpe_train_query
    q["bpe_encode_roundtrip"] = _bpe.bpe_encode_roundtrip_query
    # DSIR-style importance-weighted selection (hashed-bucket ratios)
    q["curate_dsir"] = _dsir.curate_dsir_query
    # integer-exact distributed perceptron (trainable lang/quality filter)
    q["text_lang_classifier"] = _clf.lang_classifier_query

    # --- multimodal family (binary payload + typed metadata) ---
    q["mm_metadata"] = _mm.metadata_query
    q["mm_features"] = _mm.features_query
    q["mm_thumbnail_png"] = _mm.thumbnail_png_pixels_query

    # --- ANN family (bucketed similarity at scale) ---
    q["sim_lsh_ann"] = _sim.lsh_ann_query
    q["sim_ivf_ann"] = _sim.ivf_ann_query

    # --- real-parquet interop sentinels (engine writer + reader) ---
    from parquet_go_spark.operators import parquet_sink as _pqs0

    q["pq_writer_roundtrip"] = _pqs0.writer_roundtrip_query
    q["pq_reader_roundtrip"] = _pqs0.reader_roundtrip_query
    q["pq_nested_roundtrip"] = _pqs0.nested_roundtrip_query

    # --- rt_ sentinels: full codec stack incl. auto-selection, forced
    # menu (delta/FOR/dict/RLE/BSS/ALP/FSST), and nested shredding ---
    q["rt_lineitem_auto"] = _rt.roundtrip_query("lineitem")
    q["rt_lineitem_forced"] = _rt.roundtrip_query(
        "lineitem",
        codec_map={
            "l_orderkey": "delta_binary_packed",
            "l_partkey": "for_bitpack",
            "l_suppkey": "dict",
            "l_linenumber": "rle",
            "l_quantity": "dict",
            "l_extendedprice": "byte_stream_split",
            "l_discount": "alp",
            "l_tax": "dict",
            "l_returnflag": "dict",
            "l_linestatus": "dict",
            "l_shipdate": "delta_binary_packed",
        },
    )
    # nested schemas (struct + map shredded into child sub-frames)
    q["rt_nested"] = _rt.nested_roundtrip_query

    # ---- end of the 50-query gate window; r2-hash-green families ----

    q["rt_lineitem_rans"] = _rt.roundtrip_query(
        "lineitem",
        codec_map={
            "l_suppkey": "rans",
            "l_linenumber": "rans",
            "l_returnflag": "dict_rans",
            "l_linestatus": "dict_rans",
        },
    )
    q["rt_orders"] = _rt.roundtrip_query(
        "orders",
        codec_map={
            "o_orderkey": "delta_binary_packed",
            "o_custkey": "for_bitpack",
            "o_orderstatus": "dict",
            "o_totalprice": "byte_stream_split",
            "o_orderpriority": "fsst",
        },
    )
    q["rt_part_strings"] = _rt.roundtrip_query(
        "part",
        codec_map={
            "p_partkey": "delta_binary_packed",
            "p_name": "fsst",
            "p_brand": "dict",
            "p_type": "delta_byte_array",
        },
    )
    q["rt_customer_plain"] = _rt.roundtrip_query(
        "customer",
        codec_map={
            "c_custkey": "plain", "c_name": "plain_byte_array",
            "c_nationkey": "plain", "c_acctbal": "plain",
        },
    )
    q["rt_documents"] = _rt.roundtrip_query(
        "documents",
        codec_map={"doc_id": "delta_binary_packed", "text": "fsst",
                   "lang": "dict", "source": "dict", "n_chars": "for_bitpack"},
    )
    q["rt_events"] = _rt.roundtrip_query(
        "events",
        codec_map={"event_id": "delta_binary_packed", "user_id": "dict",
                   "event_type": "dict", "value": "byte_stream_split",
                   "props": "fsst"},
    )
    # list column exploded to flat (pos, val) rows — element-wise equality
    # IS the reference's per-row token-array invariant, and the driver's
    # canonicalizer needs scalar cells
    q["rt_embeddings"] = _rt.roundtrip_exploded_query("embeddings", "embedding")
    q["rt_nation_region"] = _rt.roundtrip_query("nation")
    q["rt_supplier"] = _rt.roundtrip_query("supplier")
    # physical-type surfaces: DECIMAL (int32/int64/FLBA16 by precision)
    # and FIXED_LEN_BYTE_ARRAY (reference types/decimal.go:12-127,
    # encodingwrite_plain.go:148-159)
    q["rt_decimal"] = _rt.decimal_roundtrip_query
    q["rt_flba"] = _rt.flba_roundtrip_query
    q["rt_int96"] = _rt.int96_roundtrip_query
    # INTERVAL logical type (12-byte mon/day/millis FLBA, reference
    # types/interval.go:9-88) with the reference string rendering
    q["rt_interval"] = _rt.interval_roundtrip_query
    # GEOMETRY -> GeoJSON logical conversion (reference types/geometry.go,
    # types/geospatial_wkb.go:145-188)
    q["rt_geojson"] = _rt.geojson_roundtrip_query
    # extended ints (int8/16, uint32/64) + temporal units (ms/us ticks)
    q["rt_typed_ext"] = _rt.typed_ext_roundtrip_query
    # partial subtree read: decode one struct child, skip its siblings
    q["rt_struct_project"] = _rt.struct_project_query
    q["rt_uuid"] = _rt.uuid_roundtrip_query
    q["rt_json"] = _rt.json_roundtrip_query
    q["rt_variant"] = _rt.variant_roundtrip_query
    # shredded VARIANT: typed columns + residual + reconstruction
    # (reference marshal/variant_reconstruct.go)
    q["rt_variant_shredded"] = _rt.variant_shredded_query
    q["rt_bson"] = _rt.bson_roundtrip_query

    # --- statistics family (encode-kernel stats folding) ---
    q["stats_lineitem"] = _rt.stats_query("lineitem", NUM_LINEITEM)
    q["stats_orders"] = _rt.stats_query("orders", ["o_orderkey", "o_custkey",
                                                   "o_totalprice"])

    # --- dedup family ---
    q["dedup_exact"] = _dedup.exact_dedup_query
    q["dedup_exact_hash"] = _dedup.hash_dedup_query
    q["dedup_ngram_jaccard"] = _dedup.ngram_jaccard_query
    q["dedup_minhash_lsh"] = _dedup.minhash_lsh_query
    q["dedup_simhash"] = _dedup.simhash_query
    q["dedup_substring_spans"] = _dedup.substring_spans_query
    q["dedup_substring_scrub"] = _dedup.substring_scrub_query

    # --- text analysis family ---
    q["text_token_count"] = _text.token_count_query
    q["text_bpe_count"] = _text.bpe_count_query
    q["text_quality"] = _text.quality_query
    q["text_lang_signal"] = _text.lang_signal_query
    # sequence packing: fixed-width training windows from the global
    # token stream (distributed prefix sum + one window_id shuffle)
    q["pack_sequences"] = _pack.pack_sequences_query
    # composition: packed windows through encode_table -> decode, digest
    q["pack_encode_roundtrip"] = _pack.pack_encode_roundtrip_query
    q["text_fingerprint"] = _text.fingerprint_query
    # corpus-trained bigram-LM quality score (KenLM-style filter):
    # exact-integer count aggregates + one IEEE division per value
    q["text_bigram_lm"] = _text.bigram_lm_query
    # corpus hygiene: benchmark decontamination, PII redaction, Gopher
    # duplicate-n-gram quality signal
    q["decontam_overlap"] = _con.decontam_overlap_query
    q["pii_scrub"] = _con.pii_scrub_query
    q["text_dup_ngram"] = _con.dup_ngram_query

    # --- curation family (deterministic hash-threshold policies) ---
    q["curate_sample"] = _cur.sample_weighted_query
    q["curate_split"] = _cur.split_assign_query
    q["curate_mix"] = _cur.mix_sources_query
    q["curate_shuffle"] = _cur.global_shuffle_query
    # flagship composition: sample -> train split -> shuffle -> pack
    # -> encode -> decode -> digest, all one oracle
    q["curate_pipeline_e2e"] = _cur.pipeline_pack_encode_query

    # --- similarity family ---
    q["sim_cosine_topk"] = _sim.cosine_topk_query
    q["sim_nearest_neighbor"] = _sim.nearest_neighbor_query
    q["dedup_embedding_cosine"] = _sim.embedding_near_dup_query
    q["dedup_near_dup_cluster"] = _dedup.near_dup_cluster_query
    # column projection through the pruned-read path
    q["rt_lineitem_projected"] = _pruned.projected_decode_query
    # the thumbnail chain over REAL PNG containers (pure-stdlib codec,
    # png.py); lossless, so the raw-path pixel oracle applies verbatim
    # real Parquet WRITE interop: engine-serialized .parquet files read
    # back by Spark's JVM vectorized reader (pqwriter.py)
    from parquet_go_spark.operators import parquet_sink as _pqs

    q["text_tokenize"] = _tokz.text_tokenize_query
    q["text_postings"] = _post.text_postings_query
    q["bpe_encode"] = _bpe.bpe_encode_query
    q["mm_thumbnail"] = _mm.thumbnail_pixels_query
    q["pq_reader_embeddings"] = _pqs.reader_embeddings_query
    q["pq_writer_embeddings"] = _pqs.writer_embeddings_query
    q["pq_reader_pruned"] = _pqs.reader_pruned_query
    q["pq_reader_pages"] = _pqs.reader_pages_query
    q["pq_map_roundtrip"] = _pqs.map_roundtrip_query
    q["pq_nested_roundtrip"] = _pqs.nested_roundtrip_query
    q["pq_migration_roundtrip"] = _pqs.migration_roundtrip_query
    q["pq_writer_struct"] = _pqs.writer_struct_query
    q["pq_encrypted_roundtrip"] = _pqs.encrypted_roundtrip_query
    q["pq_logical_roundtrip"] = _pqs.logical_roundtrip_query
    q["pq_variant_shredded"] = _pqs.variant_shredded_query
    q["pq_geo_pruned"] = _pqs.geo_pruned_query
    # round-5: the reference's JSON schema-string declaration format
    # driving the engine writer (schema/json.go analog)
    q["pq_declared_roundtrip"] = _pqs.declared_roundtrip_query

    ordered = {k: q[k] for k in _GATE_WINDOW}
    ordered.update({k: v for k, v in q.items() if k not in ordered})
    assert len(ordered) == len(q)
    return ordered


# Round-5 driver-gate window (50-query prefix), least-recently-checked
# first: 14 never-checked, 5 last checked in r1, 31 r2 representatives.
_GATE_WINDOW = [
    # --- never driver-checked (registered after the r3/r4 window) ---
    "pq_map_roundtrip",
    "pq_migration_roundtrip",
    "pq_writer_struct",
    "pq_writer_embeddings",
    "pq_reader_embeddings",
    "pq_reader_pruned",
    "pq_reader_pages",
    "pq_encrypted_roundtrip",
    "pq_logical_roundtrip",
    "pq_variant_shredded",
    "pq_geo_pruned",
    "text_tokenize",
    "text_postings",
    "bpe_encode",
    # --- last driver row in round 1 ---
    "sim_nearest_neighbor",
    "dedup_embedding_cosine",
    "dedup_near_dup_cluster",
    "rt_lineitem_projected",
    "mm_thumbnail",
    # --- round-2 representatives: every distinct logical-type path ---
    "rt_decimal",
    "rt_flba",
    "rt_int96",
    "rt_interval",
    "rt_geojson",
    "rt_typed_ext",
    "rt_struct_project",
    "rt_uuid",
    "rt_json",
    "rt_variant",
    "rt_variant_shredded",
    "rt_bson",
    # --- round-2 representatives: distinct codec paths ---
    "rt_lineitem_rans",
    "rt_part_strings",
    "rt_documents",
    "rt_embeddings",
    "rt_customer_plain",
    "stats_lineitem",
    # --- round-2 representatives: pipeline operator families ---
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_fingerprint",
    "text_bigram_lm",
    "pack_encode_roundtrip",
    "decontam_overlap",
    "pii_scrub",
    "curate_pipeline_e2e",
    "curate_shuffle",
    "sim_cosine_topk",
]


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["rt_lineitem_auto"] = "SELECT * FROM lineitem"
    o["rt_lineitem_forced"] = "SELECT * FROM lineitem"
    o["rt_lineitem_rans"] = "SELECT * FROM lineitem"
    o["rt_orders"] = "SELECT * FROM orders"
    o["rt_part_strings"] = "SELECT * FROM part"
    o["rt_customer_plain"] = "SELECT * FROM customer"
    o["rt_documents"] = "SELECT * FROM documents"
    o["rt_events"] = "SELECT * FROM events"
    o["rt_embeddings"] = (
        "SELECT vec_id, label, CAST(unnest(range(len(embedding))) AS INT) AS pos,"
        " CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings"
    )
    o["rt_nation_region"] = "SELECT * FROM nation"
    o["rt_supplier"] = "SELECT * FROM supplier"
    o["rt_decimal"] = _rt.DECIMAL_ORACLE
    o["rt_flba"] = _rt.FLBA_ORACLE
    o["rt_nested"] = _rt.NESTED_ORACLE
    o["rt_int96"] = _rt.INT96_ORACLE
    o["rt_interval"] = _rt.INTERVAL_ORACLE
    o["rt_geojson"] = _rt.GEOJSON_ORACLE
    o["rt_typed_ext"] = _rt.TYPED_EXT_ORACLE
    o["rt_struct_project"] = _rt.STRUCT_PROJECT_ORACLE
    o["rt_uuid"] = _rt.UUID_ORACLE
    o["rt_json"] = _rt.JSON_ORACLE
    o["rt_variant"] = _rt.VARIANT_ORACLE
    o["rt_variant_shredded"] = _rt.VARIANT_SHREDDED_ORACLE
    o["rt_bson"] = _rt.BSON_ORACLE
    o["stats_lineitem"] = _rt.stats_oracle_sql("lineitem", NUM_LINEITEM)
    o["stats_orders"] = _rt.stats_oracle_sql(
        "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    )
    o["dedup_exact"] = _dedup.EXACT_ORACLE
    o["dedup_exact_hash"] = _dedup.HASH_ORACLE
    o["dedup_ngram_jaccard"] = _dedup.NGRAM_JACCARD_ORACLE
    o["dedup_minhash_lsh"] = _dedup.MINHASH_LSH_ORACLE
    o["dedup_simhash"] = _dedup.SIMHASH_ORACLE
    o["dedup_substring_spans"] = _dedup.SUBSTRING_SPANS_ORACLE
    o["dedup_substring_scrub"] = _dedup.SUBSTRING_SCRUB_ORACLE
    o["text_token_count"] = _text.TOKEN_COUNT_ORACLE
    o["text_bpe_count"] = _text.BPE_COUNT_ORACLE
    o["text_quality"] = _text.QUALITY_ORACLE
    o["text_lang_signal"] = _text.LANG_SIGNAL_ORACLE
    from parquet_go_spark.operators import contamination as _con
    from parquet_go_spark.operators import curation as _cur
    from parquet_go_spark.operators import packing as _pack
    o["pack_sequences"] = _pack.PACK_SEQUENCES_ORACLE
    o["pack_encode_roundtrip"] = _pack.PACK_ENCODE_ROUNDTRIP_ORACLE
    o["text_fingerprint"] = _text.FINGERPRINT_ORACLE
    o["text_bigram_lm"] = _text.BIGRAM_LM_ORACLE
    o["decontam_overlap"] = _con.DECONTAM_ORACLE
    o["pii_scrub"] = _con.PII_SCRUB_ORACLE
    o["text_dup_ngram"] = _con.DUP_NGRAM_ORACLE
    o["curate_sample"] = _cur.SAMPLE_ORACLE
    o["curate_split"] = _cur.SPLIT_ORACLE
    o["curate_mix"] = _cur.MIX_ORACLE
    o["curate_shuffle"] = _cur.SHUFFLE_ORACLE
    o["curate_pipeline_e2e"] = _cur.PIPELINE_ORACLE
    o["sim_cosine_topk"] = _sim.COSINE_TOPK_ORACLE
    o["sim_nearest_neighbor"] = _sim.NEAREST_NEIGHBOR_ORACLE
    o["sim_lsh_ann"] = _sim.LSH_ANN_ORACLE
    # integer fixed-point Lloyd (round-3): the last rows-only query now
    # has a value-exact oracle — 101/101 oracle-checked
    o["sim_ivf_ann"] = _sim.IVF_ANN_ORACLE
    o["dedup_embedding_cosine"] = _sim.EMBEDDING_NEAR_DUP_ORACLE
    o["dedup_near_dup_cluster"] = _dedup.NEAR_DUP_CLUSTER_ORACLE
    from parquet_go_spark.operators import asof as _asof

    o["join_asof"] = _asof.JOIN_ASOF_ORACLE
    from parquet_go_spark.operators import rangejoin as _rj

    o["join_range"] = _rj.JOIN_RANGE_ORACLE
    from parquet_go_spark.operators import sessions as _sess

    o["sessionize"] = _sess.SESSIONIZE_ORACLE
    from parquet_go_spark.operators import tokenize as _tokz

    o["text_tokenize"] = _tokz.TEXT_TOKENIZE_ORACLE
    o["tokenize_encode_roundtrip"] = _tokz.TOKENIZE_ENCODE_ROUNDTRIP_ORACLE
    from parquet_go_spark.operators import postings as _post

    o["text_postings"] = _post.TEXT_POSTINGS_ORACLE
    o["postings_encode_roundtrip"] = _post.POSTINGS_ENCODE_ROUNDTRIP_ORACLE
    from parquet_go_spark.operators import keywords as _kw

    o["text_keywords"] = _kw.TEXT_KEYWORDS_ORACLE
    from parquet_go_spark.operators import retrieval as _ret

    o["text_bm25"] = _ret.TEXT_BM25_ORACLE
    from parquet_go_spark.operators import bpe as _bpe

    o["bpe_train"] = _bpe.BPE_TRAIN_ORACLE
    o["bpe_encode"] = _bpe.BPE_ENCODE_ORACLE
    o["bpe_encode_roundtrip"] = _bpe.BPE_ENCODE_ROUNDTRIP_ORACLE
    from parquet_go_spark.operators import dsir as _dsir

    o["curate_dsir"] = _dsir.CURATE_DSIR_ORACLE
    from parquet_go_spark.operators import partspec as _psp

    o["prune_hidden_partition"] = _psp.HIDDEN_PARTITION_ORACLE
    from parquet_go_spark.operators import classifier as _clf

    o["text_lang_classifier"] = _clf.LANG_CLASSIFIER_ORACLE
    o["prune_stats_range"] = _pruned.STATS_PRUNED_RANGE_ORACLE
    o["prune_bloom_point"] = _pruned.BLOOM_PRUNED_POINT_ORACLE
    o["prune_pages"] = _pruned.PAGE_PRUNED_RANGE_ORACLE
    o["prune_zorder"] = _pruned.ZORDER_PRUNED_BOX_ORACLE
    o["prune_geo_bbox"] = _pruned.GEO_PRUNED_BBOX_ORACLE
    o["prune_token_bloom"] = _pruned.TOKEN_MEMBERSHIP_ORACLE
    o["stats_hll_distinct"] = _sketch.HLL_DISTINCT_ORACLE
    o["stats_cms_freq"] = _sketch.CMS_TOPK_ORACLE
    o["stats_quantiles"] = _sketch.QUANTILES_ORACLE
    o["rt_lineitem_projected"] = _pruned.PROJECTED_DECODE_ORACLE
    o["mm_thumbnail_png"] = _mm.THUMBNAIL_ORACLE
    from parquet_go_spark.operators import parquet_sink as _pqs

    o["pq_writer_roundtrip"] = _pqs.WRITER_ROUNDTRIP_ORACLE
    o["pq_reader_roundtrip"] = _pqs.READER_ROUNDTRIP_ORACLE
    o["pq_reader_embeddings"] = _pqs.EMBEDDINGS_EXPLODED_ORACLE
    o["pq_writer_embeddings"] = _pqs.EMBEDDINGS_EXPLODED_ORACLE
    o["pq_reader_pruned"] = _pqs.READER_PRUNED_ORACLE
    o["pq_migration_roundtrip"] = _pqs.MIGRATION_ROUNDTRIP_ORACLE
    o["pq_writer_struct"] = _pqs.WRITER_STRUCT_ORACLE
    o["pq_encrypted_roundtrip"] = _pqs.ENCRYPTED_ROUNDTRIP_ORACLE
    o["pq_logical_roundtrip"] = _pqs.LOGICAL_ROUNDTRIP_ORACLE
    o["pq_variant_shredded"] = _pqs.VARIANT_SHREDDED_ORACLE
    o["pq_geo_pruned"] = _pqs.GEO_PRUNED_ORACLE
    o["pq_reader_pages"] = _pqs.READER_PAGES_ORACLE
    o["pq_map_roundtrip"] = _pqs.MAP_ROUNDTRIP_ORACLE
    o["pq_declared_roundtrip"] = _pqs.DECLARED_ROUNDTRIP_ORACLE
    o["pq_nested_roundtrip"] = _pqs.NESTED_ROUNDTRIP_ORACLE
    from parquet_go_spark.sources import pgs_datasource as _ds

    o["ds_pruned_read"] = _pruned.STATS_PRUNED_RANGE_ORACLE
    o["ds_write_roundtrip"] = _ds.DS_WRITE_ROUNDTRIP_ORACLE
    o["stats_agg_manifest"] = _ds.STATS_AGG_MANIFEST_ORACLE
    from parquet_go_spark.operators import sketch as _sk2

    # the manifest-merged NDV must equal ONE whole-table HLL: the oracle
    # is the same DuckDB hash re-derivation stats_hll_distinct uses
    o["stats_ndv_manifest"] = _sk2.HLL_DISTINCT_ORACLE
    o["ds_variant_shredded"] = _ds.DS_VARIANT_SHREDDED_ORACLE
    o["ds_delete_read"] = _ds.DS_DELETE_READ_ORACLE
    o["ds_delete_compact"] = _ds.DS_DELETE_READ_ORACLE
    o["ds_schema_evolution"] = _ds.DS_SCHEMA_EVOLUTION_ORACLE
    o["ds_upsert"] = _ds.DS_UPSERT_ORACLE
    o["ds_eq_delete"] = _ds.DS_EQ_DELETE_ORACLE
    o["ds_update"] = _ds.DS_UPDATE_ORACLE
    o["ds_rollback"] = _ds.DS_ROLLBACK_ORACLE
    o["ds_stream_source"] = _ds.DS_STREAM_SOURCE_ORACLE
    o["ds_branch_wap"] = _ds.DS_BRANCH_WAP_ORACLE
    o["ds_merge"] = _ds.DS_MERGE_ORACLE
    o["ds_recluster"] = _ds.DS_RECLUSTER_ORACLE
    o["ds_shred_project"] = _ds.DS_SHRED_PROJECT_ORACLE
    from parquet_go_spark.operators import changes as _chg

    o["ds_changes_feed"] = _chg.DS_CHANGES_FEED_ORACLE
    o["mm_metadata"] = _mm.METADATA_ORACLE
    o["mm_features"] = _mm.FEATURES_ORACLE
    o["mm_thumbnail"] = _mm.THUMBNAIL_ORACLE
    return o

"""Plan audit: regenerate PLANS.md from live .explain output.

For each audited catalog query this extracts the plan facts that decide
100 TB behavior — scan pushdown (PushedFilters/ReadSchema), join
strategies, exchange (shuffle) count, whole-stage-codegen coverage,
Python (Arrow) eval nodes, reused exchanges — so a reviewer can see the
physical shape without running Spark. Run after any operator change:

    python tools/planaudit.py   # rewrites PLANS.md
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"

AUDITED = [
    "pricing_summary",
    "sql_shipping_priority",
    "join_broadcast_dims",
    "filter_range",
    "window_rank",
    "dedup_exact",
    "dedup_minhash_lsh",
    "similarity_topk",
    "events_session",
    "zonal_mean_large",
    "zonal_large_broadcast",
    "zonal_polygons",
    "corpus_pack_shards",
    "agg_salted_skew",
    "corpus_sample_stratified",
    "corpus_decontaminate",
    "text_repetition",
    "events_funnel",
    "text_sentences_udtf",
    "agg_geomean_udaf",
    "join_asof",
    "similarity_topk_quantized",
    "crs_reproject_utm",
    "crs_reproject_lcc",
    "crs_reproject_albers",
    "crs_reproject_sinu",
    "raster_lzw_ingest",
    "raster_bigtiff_ingest",
    "raster_warp_bilinear",
    "raster_warp_average",
    "raster_pyramid",
    "raster_hillshade",
    "raster_slope_aspect",
    "raster_clump",
    "raster_burn",
    "raster_proximity",
    "sink_tokenbin_roundtrip",
    "mv_sketch_distinct_gate",
    "geo_zone_centroid",
    "geo_zone_area_sphere",
    "window_distribution",
    "join_full_outer",
    "raster_pyramid_estate",
    "raster_sieve_fill",
    "embedding_pca_gate",
    "similarity_opq_gate",
    "similarity_ivf_pq_refine",
    "similarity_filtered_search",
    "dedup_incremental",
    "corpus_lm_cross",
    "geo_dwithin_join",
    "vector_shapefile_ingest",
    "crs_reproject_tm",
    "crs_reproject_polar",
    "vector_reproject_zones",
    "geo_validity_report",
    "vector_clip_extent",
    "raster_polygonize",
    "raster_contour",
    "crs_standardize_mixed",
    "crs_standardize_datum",
    "crs_reproject_krovak",
    "multimodal_decode_png",
    "multimodal_decode_wav",
    "multimodal_decode_gif",
    "multimodal_decode_jpeg",
    "multimodal_gif_disposal",
    "multimodal_decode_png_palette",
    "multimodal_resize_png",
    "pipeline_end_to_end",
    "dedup_clusters",
    "streaming_vector_ingest",
    "streaming_media_ingest",
    "raster_mosaic",
    "sql_promo_revenue",
    "corpus_dup_spans",
    "streaming_raster_ingest",
    "corpus_curation",
    "text_scrub_pii",
    "corpus_chunk",
    "raster_geotiff_ingest",
    "raster_multiband_band2",
    "similarity_recall",
    "source_csv_roundtrip",
    "sink_json_roundtrip",
    "sink_geojsonl_roundtrip",
    "tiles_encode_rings",
    "sink_orc_roundtrip",
    "merge_upsert",
    "snapshot_diff",
    "scd2_history",
    "corpus_mix",
    "table_profile",
    "corpus_vocab",
    "corpus_tfidf",
    "column_hist",
    "dq_checks",
    "mv_incremental",
    "layout_zorder",
    "skew_heavy_hitters",
    "skew_key_report",
    "sql_local_supplier_volume",
    "sql_returned_items",
    "embedding_kmeans",
    "text_search_bm25",
    "join_interval_overlap",
    "mv_refresh",
    "graph_pagerank",
    "events_rolling",
    "events_outliers",
    "column_corr",
    "ingest_dead_letters",
    "sql_forecast_revenue",
    "sql_shipmode_priority",
    "geo_nearest_site",
    "feature_quantile_bins",
    "unpivot_measures",
    "pseudonymize_ids",
    "corpus_bpe_pairs",
    "text_char_entropy",
    "join_fuzzy_names",
    "sql_customer_distribution",
    "sql_small_qty_revenue",
    "sql_large_volume_customer",
    "sql_waiting_suppliers",
    "sql_sales_opportunity",
    "layout_bucketed_join",
    "graph_triangles",
    "text_boilerplate",
    "corpus_length_buckets",
    "column_mad",
    "join_asof_forward",
    "join_asof_nearest",
    "corpus_bpe_train",
    "geo_zone_metrics",
    "sql_volume_shipping",
    "sql_top_supplier",
    "sql_or_bands",
    "zonal_weighted_mean",
    "zonal_all_touched",
    "source_geotiff_datasource",
    "streaming_enrich",
    "sql_product_profit",
    "sql_important_stock",
    "sql_part_supplier",
    "sql_lateral_topn",
    "sql_min_cost_supplier",
    "sql_excess_stock",
    "corpus_pack_sequences",
    "corpus_shuffle",
    "events_props_json",
    "corpus_bpe_encode",
    "events_gap_fill",
    "json_variant_scalars",
    "corpus_dup_spans_clean",
    "corpus_lm_score",
    "text_gopher_rules",
    "corpus_dsir",
    "dedup_semantic",
    "corpus_line_dedup",
    "similarity_pq_gate",
    "similarity_ivf_pq",
    "similarity_pq_pca_gate",
]


def facts(plan: str) -> dict:
    joins = sorted(
        {
            m
            for m in re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        }
    )
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "joins": joins or ["(none)"],
        "exchanges": len(re.findall(r"\) Exchange\b", plan)),
        "reused": len(re.findall(r"ReusedExchange", plan)),
        "partial_agg": bool(re.search(r"partial_(?:sum|count|min|max|avg)", plan)),
        "cached": len(re.findall(r"InMemoryTableScan", plan)),
        "python_nodes": len(
            re.findall(r"\(\d+\) (?:ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)", plan)
        ),
        "pushed": [p for p in pushed if p],
        "read_cols": [s.count(":") for s in schemas if s],
    }


def main() -> None:
    from sids_data_pipeline_spark.plans.catalog import all_queries
    from sids_data_pipeline_spark.session import get_spark

    spark = get_spark("planaudit")
    catalog = all_queries()
    lines = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        "Regenerated by `python tools/planaudit.py` (sf0.01 inputs; plan",
        "shape is data-size independent). Facts extracted from",
        "`.explain` output: join strategies, shuffle (Exchange) count,",
        "ReusedExchange hits, map-side partial aggregation, Python",
        "(Arrow) nodes, cached-subtree hits, and parquet scan pushdown.",
        "",
        "| Query | Joins | Shuffles | Reused | Map-side partial agg | Python nodes | Cache hits | Scan pushdown |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in AUDITED:
        df = catalog[name].spark(spark, SF_DIR)
        df.count()  # execute so AQE finalizes the adaptive plan
        jvm = spark._jvm
        plan = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        f = facts(plan)
        pushed = (
            "; ".join(f["pushed"])[:60] + ("…" if len("; ".join(f["pushed"])) > 60 else "")
            if f["pushed"]
            else ("cols:" + ",".join(map(str, f["read_cols"])) if f["read_cols"] else "synthetic input")
        )
        lines.append(
            f"| `{name}` | {', '.join(f['joins'])} | {f['exchanges']} | "
            f"{f['reused']} | {'yes' if f['partial_agg'] else '—'} | {f['python_nodes']} | "
            f"{f['cached']} | {pushed} |"
        )
    lines += [
        "",
        "Reading guide:",
        "",
        "- **No CartesianProduct anywhere**; every data-path join (including",
        "  the spatial ones) is hash-joinable on an equi-key. The",
        "  BroadcastNestedLoopJoin inside the zonal queries is the intentional",
        "  result-universe crossJoin (zones × distinct raster ids, output-",
        "  bounded at |zones|·|rasters| rows) that re-attaches empty zones,",
        "  not a per-pixel join.",
        "- `zonal_large_broadcast` shows 0 Python nodes: the rectangle fast",
        "  path keeps containment in whole-stage codegen; `zonal_polygons`",
        "  keeps its Arrow kernel only for non-rectangle geometries.",
        "- `PushedFilters` on the scan queries shows predicate pushdown",
        "  reaching parquet; synthetic-input queries (spark.range fixtures)",
        "  have no scan to push into.",
        "- Shuffle counts are the plan's Exchange nodes; AQE may coalesce or",
        "  convert them at runtime (skew-join splitting is enabled).",
        "- **Cache hits** are InMemoryTableScan nodes: persisted shared",
        "  subtrees (LSH token/signature tables, zone dimension) materialize",
        "  once and are re-read, the Spark analogue of a CTE.",
        "- `agg_salted_skew` scans 3 columns, not the table's 11: the salt",
        "  hashes only the columns the aggregation touches, so salting does",
        "  not defeat column pruning.",
    ]
    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote PLANS.md ({len(AUDITED)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()

"""ES pipeline aggregations: cumulative_sum / derivative under
date_histogram, bucket_selector / bucket_sort under terms.

Hand-counted fixtures pin the running-total / delta / filter / paging
laws; dispatcher strictness is pinned so unsupported Painless or
buckets_path shapes raise by name instead of silently degrading.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.operators.search_api import es_search


@pytest.fixture(scope="module")
def dv_idx(spark, tmp_path_factory):
    rows = [
        (1, "alpha beta", 10, "x", dt.date(2024, 1, 20)),
        (2, "alpha gamma", 20, "y", dt.date(2024, 2, 5)),
        (3, "alpha beta beta", 30, "x", dt.date(2024, 2, 25)),
        (4, "delta only", 40, "z", dt.date(2024, 3, 1)),
        (5, "alpha delta", 50, None, dt.date(2024, 3, 9)),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, val long, tag string, d date"
    )
    path = str(tmp_path_factory.mktemp("pipeagg") / "idx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["val", "tag", "d"],
    )
    return SRCH.load_postings_index(spark, path)


def test_cumulative_and_derivative_over_month_histogram(dv_idx):
    # "alpha" hits docs 1,2,3,5 -> months Jan:1 Feb:2 Mar:1
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {
                "cum": {"cumulative_sum": {"buckets_path": "_count"}},
                "der": {"derivative": {"buckets_path": "_count"}},
            },
        }},
    }).collect()
    got = [(r["bucket"].isoformat() if hasattr(r["bucket"], "isoformat")
            else str(r["bucket"]), r["n_docs"], r["cum"], r["der"])
           for r in out]
    assert got == [
        ("2024-01-01", 1, 1, None),   # first bucket: derivative NULL (ES)
        ("2024-02-01", 2, 3, 1),
        ("2024-03-01", 1, 4, -1),
    ]


def test_bucket_selector_keeps_only_passing_buckets(dv_idx):
    # hits 1,2,3,5; tag buckets: x {1,3} n=2, y {2} n=1; NULL tag excluded
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"per_tag": {
            "terms": {"field": "tag"},
            "aggs": {
                "v": {"stats": {"field": "val"}},
                "keep": {"bucket_selector": {
                    "buckets_path": {"n": "_count"},
                    "script": "params.n >= 2",
                }},
            },
        }},
    }).collect()
    assert [(r["bucket"], r["n_docs"], r["sum_val"]) for r in out] == [
        ("x", 2, 40)
    ]


def test_bucket_selector_stats_count_excludes_nulls(spark, tmp_path):
    # ES stats.count counts metric VALUES, not bucket docs: tag 'x'
    # has 2 docs but only 1 non-NULL val, so '<stats>.count >= 2'
    # must drop it while '_count >= 2' keeps it (round-13 advisor
    # finding — count previously aliased the bucket doc count)
    rows = [
        (1, "alpha one", 10, "x"),
        (2, "alpha two", None, "x"),
        (3, "alpha three", 30, "y"),
        (4, "alpha four", 40, "y"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, val long, tag string"
    )
    path = str(tmp_path / "nullidx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["val", "tag"],
    )
    idx = SRCH.load_postings_index(spark, path)

    def run(script, path_key):
        return es_search(idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"t": {
                "terms": {"field": "tag"},
                "aggs": {
                    "v": {"stats": {"field": "val"}},
                    "k": {"bucket_selector": {
                        "buckets_path": {"c": path_key},
                        "script": script,
                    }},
                },
            }},
        }).collect()

    by_values = run("params.c >= 2", "v.count")
    assert [r["bucket"] for r in by_values] == ["y"]
    by_docs = run("params.c >= 2", "_count")
    assert sorted(r["bucket"] for r in by_docs) == ["x", "y"]
    # the buckets_path helper column never leaks into the response
    assert "val_count" not in by_values[0].asDict()


def test_histogram_zero_fill_bounded_at_max_buckets(dv_idx):
    # interval 0.0001 over vals 10..50 would grid ~400k buckets —
    # past ES's search.max_buckets (65536) the request must raise by
    # name instead of exploding the zero-fill (round-13 advisor
    # finding; ES throws too_many_buckets_exception)
    with pytest.raises(ValueError, match="max_buckets"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"h": {"histogram": {
                "field": "val", "interval": 0.0001,
                "min_doc_count": 0,
            }}},
        }).collect()


def test_bucket_sort_orders_by_metric_and_pages(dv_idx):
    # x sum=40, y sum=20 -> asc: y first; from=0 size=1 keeps y only
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"per_tag": {
            "terms": {"field": "tag"},
            "aggs": {
                "v": {"stats": {"field": "val"}},
                "page": {"bucket_sort": {
                    "sort": [{"v.sum": {"order": "asc"}}], "size": 1,
                }},
            },
        }},
    }).collect()
    assert [(r["bucket"], r["sum_val"]) for r in out] == [("y", 20)]


def test_bucket_sort_from_skips_leading_buckets(dv_idx):
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"per_tag": {
            "terms": {"field": "tag"},
            "aggs": {
                "v": {"stats": {"field": "val"}},
                "page": {"bucket_sort": {
                    "sort": [{"v.sum": {"order": "asc"}}],
                    "from": 1,
                }},
            },
        }},
    }).collect()
    assert [(r["bucket"], r["sum_val"]) for r in out] == [("x", 40)]


def test_moving_fn_slides_the_bucket_window(dv_idx):
    # months Jan:1 Feb:2 Mar:1; window=2 shift=0 covers the PREVIOUS
    # two buckets excluding current (ES moving_fn default)
    Q20 = 1 << 20
    base = {"query": {"match": {"text": "alpha"}}}
    out = es_search(dv_idx, {**base, "aggs": {"m": {
        "date_histogram": {"field": "d", "calendar_interval": "month"},
        "aggs": {
            "avg": {"moving_fn": {
                "buckets_path": "_count", "window": 2,
                "script": "MovingFunctions.unweightedAvg(values)",
            }},
            "tot": {"moving_fn": {
                "buckets_path": "_count", "window": 2,
                "script": "MovingFunctions.sum(values)",
            }},
        },
    }}}).collect()
    got = [(r["n_docs"], r["avg"], r["tot"]) for r in out]
    # empty window: avg NULL (MovingFunctions NaN), sum 0 (Lucene law)
    assert got == [
        (1, None, 0),
        (2, 1 * Q20, 1),
        (1, (3 * Q20) // 2, 3),
    ]
    # shift=1 anchors the window to include the current bucket
    out = es_search(dv_idx, {**base, "aggs": {"m": {
        "date_histogram": {"field": "d", "calendar_interval": "month"},
        "aggs": {"mx": {"moving_fn": {
            "buckets_path": "_count", "window": 1, "shift": 1,
            "script": "MovingFunctions.max(values)",
        }}},
    }}}).collect()
    assert [(r["n_docs"], r["mx"]) for r in out] == [(1, 1), (2, 2), (1, 1)]


def test_significant_aggs_dispatch_from_the_request_body(dv_idx):
    from pycasselastic_spark.operators.search_ext import significant_text

    body = {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"sig": {"significant_text": {
            "field": "text", "size": 5, "min_doc_count": 2,
            "chi_square": {"include_negatives": False,
                           "background_is_superset": True},
        }}},
    }
    got = es_search(dv_idx, body).collect()
    want = significant_text(
        dv_idx, ["alpha"], m=5, min_fg_df=2, heuristic="chi_square"
    ).collect()
    assert got == want
    # significant_terms dispatches onto the same scorer (jlh default)
    got2 = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"sig": {"significant_terms": {"field": "text"}}},
    }).collect()
    assert got2 == significant_text(dv_idx, ["alpha"]).collect()
    with pytest.raises(ValueError, match="doc-values field"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"s": {"significant_text": {"field": "tag"}}},
        })
    with pytest.raises(ValueError, match="include_negatives"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"s": {"significant_text": {
                "field": "text",
                "chi_square": {"include_negatives": True,
                               "background_is_superset": True},
            }}},
        })
    # a typo'd field must raise, not silently serve the text field
    # (round-14 review finding; the index records its text column)
    with pytest.raises(ValueError, match="analyzed 'text'"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"s": {"significant_text": {"field": "titel"}}},
        })


def test_runtime_mappings_fields_act_like_stored_fields(dv_idx):
    # val2 = val * 2: range filter + stats agg both see it
    rt = {"val2": {"type": "long",
                   "script": {"source": "emit(doc['val'].value * 2)"}}}
    got = {r["doc_id"] for r in es_search(dv_idx, {
        "runtime_mappings": rt,
        "query": {"range": {"val2": {"gte": 40, "lte": 60}}},
    }).collect()}
    assert got == {2, 3}  # val 20,30 -> 40,60
    row = es_search(dv_idx, {
        "runtime_mappings": rt,
        "query": {"match": {"text": "alpha"}},
        "aggs": {"s": {"stats": {"field": "val2"}}},
    }).collect()[0]
    assert (row["min_val"], row["max_val"], row["sum_val"]) == (20, 100, 220)
    # strictness: rich scripts / unknown sources / shadowing raise
    with pytest.raises(ValueError, match="runtime script"):
        es_search(dv_idx, {
            "runtime_mappings": {"x": {"type": "long", "script": {
                "source": "emit(doc['val'].value * doc['val'].value)"}}},
            "query": {"match_all": {}},
        })
    with pytest.raises(ValueError, match="not\\s+stored"):
        es_search(dv_idx, {
            "runtime_mappings": {"x": {"type": "long", "script": {
                "source": "emit(doc['nope'].value)"}}},
            "query": {"match_all": {}},
        })
    with pytest.raises(ValueError, match="shadows"):
        es_search(dv_idx, {
            "runtime_mappings": {"val": {"type": "long", "script": {
                "source": "emit(doc['val'].value)"}}},
            "query": {"match_all": {}},
        })
    with pytest.raises(ValueError, match="divides by zero"):
        es_search(dv_idx, {
            "runtime_mappings": {"x": {"type": "long", "script": {
                "source": "emit(doc['val'].value / 0)"}}},
            "query": {"match_all": {}},
        })


def test_pipeline_missing_keys_raise_by_name(dv_idx):
    base = {"query": {"match": {"text": "alpha"}}}
    with pytest.raises(ValueError, match="moving_fn missing"):
        es_search(dv_idx, {**base, "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {"p": {"moving_fn": {
                "script": "MovingFunctions.sum(values)", "window": 3,
            }}},
        }}})
    with pytest.raises(ValueError, match="moving_avg missing"):
        es_search(dv_idx, {**base, "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {"p": {"moving_avg": {"window": 2}}},
        }}})
    with pytest.raises(ValueError, match="top_metrics missing"):
        es_search(dv_idx, {**base, "aggs": {"t": {
            "terms": {"field": "tag"},
            "aggs": {"p": {"top_metrics": {
                "metrics": {"field": "val"},
            }}},
        }}})


def test_rate_scales_bucket_counts_to_the_unit(dv_idx):
    # daily fixed buckets, unit=hour: each 1-doc bucket reads
    # floor(1 * (3600/86400) * Q20) = floor(Q20/24) = 43690
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"days": {
            "date_histogram": {"field": "d", "fixed_interval": "1d"},
            "aggs": {"hourly": {"rate": {"unit": "hour"}}},
        }},
    }).collect()
    assert all(r["hourly"] == 43690 * r["n_docs"] for r in out)
    with pytest.raises(ValueError, match="calendar_interval parent"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"m": {
                "date_histogram": {"field": "d",
                                   "calendar_interval": "month"},
                "aggs": {"r": {"rate": {"unit": "hour"}}},
            }},
        })
    with pytest.raises(ValueError, match="rate unit"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"m": {
                "date_histogram": {"field": "d", "fixed_interval": "1d"},
                "aggs": {"r": {"rate": {"unit": "month"}}},
            }},
        })


def test_boxplot_exact_quartiles(dv_idx):
    # hits 1,2,3,5 -> vals 10,20,30,50: q1=17.5 q2=25 q3=35 (the
    # percentile/quantile_cont interpolation law)
    Q20 = 1 << 20
    row = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"b": {"boxplot": {"field": "val"}}},
    }).collect()[0]
    assert (row["n_vals"], row["min_val"], row["max_val"]) == (4, 10, 50)
    assert row["q1_q20"] == int(17.5 * Q20)
    assert row["q2_q20"] == 25 * Q20
    assert row["q3_q20"] == 35 * Q20
    with pytest.raises(ValueError, match="boxplot options"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"b": {"boxplot": {"field": "val",
                                       "compression": 200}}},
        })


def test_top_metrics_picks_the_sorted_top_per_bucket(dv_idx):
    # tag x: docs 1(val 10), 3(val 30) -> top by val desc is 30;
    # tag y: doc 2 -> 20; doc 5's NULL tag excluded
    out = {r["bucket"]: r for r in es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"t": {
            "terms": {"field": "tag"},
            "aggs": {"top": {"top_metrics": {
                "metrics": {"field": "val"},
                "sort": {"val": "desc"},
            }}},
        }},
    }).collect()}
    assert out["x"]["n_docs"] == 2 and out["x"]["top_metric"] == 30
    assert out["y"]["n_docs"] == 1 and out["y"]["top_metric"] == 20
    assert out["x"]["top_sort"] == 30
    # asc flips the pick
    asc = {r["bucket"]: r["top_metric"] for r in es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"t": {
            "terms": {"field": "tag"},
            "aggs": {"top": {"top_metrics": {
                "metrics": {"field": "val"},
                "sort": {"val": {"order": "asc"}},
            }}},
        }},
    }).collect()}
    assert asc == {"x": 10, "y": 20}
    with pytest.raises(ValueError, match="size > 1"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"t": {
                "terms": {"field": "tag"},
                "aggs": {"top": {"top_metrics": {
                    "metrics": {"field": "val"},
                    "sort": {"val": "desc"}, "size": 3,
                }}},
            }},
        })


def test_moving_avg_simple_includes_current_bucket(dv_idx):
    # legacy moving_avg 'simple' = unweightedAvg anchored to include
    # the current bucket; window truncates at the series head
    Q20 = 1 << 20
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {"sm": {"moving_avg": {
                "buckets_path": "_count", "window": 2,
            }}},
        }},
    }).collect()
    assert [(r["n_docs"], r["sm"]) for r in out] == [
        (1, 1 * Q20), (2, (3 * Q20) // 2), (1, (3 * Q20) // 2),
    ]


@pytest.mark.parametrize("body_patch,needle", [
    # moving_fn scripts beyond the four exact reductions raise by name
    ({"aggs": {"m": {"date_histogram": {
        "field": "d", "calendar_interval": "month"},
        "aggs": {"p": {"moving_fn": {
            "buckets_path": "_count", "window": 3,
            "script": "MovingFunctions.ewma(values, 0.3)"}}}}}},
     "moving_fn script"),
    # moving_avg models that fit state are not exact reductions
    ({"aggs": {"m": {"date_histogram": {
        "field": "d", "calendar_interval": "month"},
        "aggs": {"p": {"moving_avg": {
            "buckets_path": "_count", "model": "ewma"}}}}}},
     "moving_avg model"),
    # buckets_path beyond _count under date_histogram pipelines
    ({"aggs": {"m": {"date_histogram": {
        "field": "d", "calendar_interval": "month"},
        "aggs": {"p": {"cumulative_sum": {"buckets_path": "other"}}}}}},
     "buckets_path"),
    # selector over the Q20-quantized avg: wrong units, must raise
    ({"aggs": {"t": {"terms": {"field": "tag"}, "aggs": {
        "v": {"stats": {"field": "val"}},
        "k": {"bucket_selector": {
            "buckets_path": {"a": "v.avg"},
            "script": "params.a > 1",
        }}}}}},
     "avg"),
    # Painless beyond one comparison raises by name
    ({"aggs": {"t": {"terms": {"field": "tag"}, "aggs": {
        "v": {"stats": {"field": "val"}},
        "k": {"bucket_selector": {
            "buckets_path": {"a": "_count"},
            "script": "params.a > 1 && params.a < 5",
        }}}}}},
     "bucket_selector"),
    # pipelines need the metric sub-agg that defines bucket columns
    ({"aggs": {"t": {"terms": {"field": "tag"}, "aggs": {
        "k": {"bucket_selector": {
            "buckets_path": {"a": "_count"},
            "script": "params.a > 1",
        }}}}}},
     "stats"),
])
def test_pipeline_strictness(dv_idx, body_patch, needle):
    body = {"query": {"match": {"text": "alpha"}}}
    body.update(body_patch)
    with pytest.raises(ValueError, match=needle):
        es_search(dv_idx, body)


# --- filters / adjacency_matrix ---------------------------------------------


def test_filters_agg_counts_named_buckets_and_keeps_empty(dv_idx):
    # hits 1,2,3,5; tag x: {1,3}; val>=50: {5}; tag 'missing': none -> 0
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"seg": {"filters": {"filters": {
            "x": {"term": {"tag": "x"}},
            "big": {"range": {"val": {"gte": 50}}},
            "none": {"term": {"tag": "missing"}},
        }}}},
    }).collect()
    assert {(r["bucket"], r["n_docs"]) for r in out} == {
        ("x", 2), ("big", 1), ("none", 0),
    }


def test_adjacency_matrix_omits_zero_buckets_and_intersects(dv_idx):
    # hits 1,2,3,5; x:{1,3}, big(val>=30):{3,5}; x&big:{3}; y:{2}
    # y&x and y&big empty -> omitted
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"m": {"adjacency_matrix": {"filters": {
            "x": {"term": {"tag": "x"}},
            "big": {"range": {"val": {"gte": 30}}},
            "y": {"term": {"tag": "y"}},
        }}}},
    }).collect()
    assert {(r["bucket"], r["n_docs"]) for r in out} == {
        ("x", 2), ("big", 2), ("y", 1), ("big&x", 1),
    }


def test_filters_agg_anonymous_array_form_raises(dv_idx):
    with pytest.raises(ValueError, match="anonymous"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"seg": {"filters": {"filters": [
                {"term": {"tag": "x"}},
            ]}}},
        })


# --- rank_feature / distance_feature / pinned --------------------------------


def test_rank_feature_saturation_law(dv_idx):
    import math

    out = es_search(dv_idx, {
        "query": {"rank_feature": {
            "field": "val", "saturation": {"pivot": 20}, "boost": 2.0,
        }},
        "size": 10,
    }).collect()
    got = {r["doc_id"]: r["score_q20"] for r in out}
    want = {i: math.floor(2.0 * (v / (v + 20.0)) * 1048576)
            for i, v in [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]}
    assert got == want
    # monotone in the feature: 5 first, 1 last
    assert [r["doc_id"] for r in out] == [5, 4, 3, 2, 1]


def test_rank_feature_requires_explicit_pivot(dv_idx):
    with pytest.raises(ValueError, match="pivot"):
        es_search(dv_idx, {"query": {"rank_feature": {"field": "val"}}})
    with pytest.raises(ValueError, match="rank_feature options"):
        es_search(dv_idx, {"query": {"rank_feature": {
            "field": "val", "log": {"scaling_factor": 4}}}})


def test_pinned_promotes_in_list_order_and_skips_missing(dv_idx):
    out = es_search(dv_idx, {
        "query": {"pinned": {
            "ids": [4, 99, 2],          # 99 doesn't exist -> skipped
            "organic": {"match": {"text": "alpha beta"}},
        }},
        "size": 4,
    }).collect()
    ids = [(r["rnk"], r["doc_id"], r["pinned"]) for r in out]
    # pinned 4 then 2 in LIST order; organic best next, 2/4 excluded
    assert ids[0] == (1, 4, True)
    assert ids[1] == (2, 2, True)
    assert all(not r["pinned"] for r in out[2:])
    assert {r["doc_id"] for r in out[2:]}.isdisjoint({2, 4})
    assert len(out) == 4  # page is size-bounded, pinned don't extend it


# --- combined_fields ----------------------------------------------------------


@pytest.fixture(scope="module")
def cf_indexes(spark, tmp_path_factory):
    from pycasselastic_spark.operators.search_index import Analyzer

    ident = Analyzer(lowercase=False, strip_punct=False)
    title = spark.createDataFrame(
        [(1, "spark join"), (2, "scan only"), (3, "spark")],
        ["doc_id", "title"],
    )
    body = spark.createDataFrame(
        [(1, "other words here"), (2, "spark spark"), (3, "")],
        ["doc_id", "body"],
    )
    base = tmp_path_factory.mktemp("cf")
    SRCH.build_postings_index(title, "doc_id", "title", str(base / "t"),
                              n_buckets=4, analyzer=ident)
    SRCH.build_postings_index(body, "doc_id", "body", str(base / "b"),
                              n_buckets=4, analyzer=ident)
    return {
        "title": SRCH.load_postings_index(spark, str(base / "t")),
        "body": SRCH.load_postings_index(spark, str(base / "b")),
    }


def test_combined_fields_matches_hand_computed_bm25f(cf_indexes):
    import math

    out = es_search(cf_indexes["title"], {
        "query": {"combined_fields": {
            "query": "spark", "fields": ["title", "body^2"],
        }},
    }, field_indexes=cf_indexes).collect()
    got = {r["doc_id"]: r["score_q20"] for r in out}
    # combined stats: N=3; dl_c: d1=2+2*3=8, d2=2+2*2=6, d3=1+0=1
    # avgdl=(5 + 2*5)/3 = 5.0; tf_c: d1=1, d2=4, d3=1; df(spark)=3
    n, avgdl = 3.0, 5.0
    idf = math.log(1.0 + (n - 3 + 0.5) / (3 + 0.5))

    def s(tf_c, dl_c):
        return math.floor(
            idf * (tf_c * 2.2)
            / (tf_c + 1.2 * (0.25 + 0.75 * dl_c / avgdl))
            * 1048576
        )

    assert got == {1: s(1, 8), 2: s(4, 6), 3: s(1, 1)}


def test_combined_fields_and_requires_all_terms(cf_indexes):
    out = es_search(cf_indexes["title"], {
        "query": {"combined_fields": {
            "query": "spark join", "fields": ["title", "body"],
            "operator": "and",
        }},
    }, field_indexes=cf_indexes).collect()
    # only doc 1 has both terms across the combined field
    assert [r["doc_id"] for r in out] == [1]


def test_combined_fields_strictness(cf_indexes, spark, tmp_path):
    with pytest.raises(ValueError, match="boost"):
        es_search(cf_indexes["title"], {
            "query": {"combined_fields": {
                "query": "spark", "fields": ["title^0.5"],
            }},
        }, field_indexes=cf_indexes)
    # legacy (analyzer=None) indexes store slot-count norms -> raise
    legacy = spark.createDataFrame([(1, "a b")], ["doc_id", "t"])
    lp = str(tmp_path / "legacy")
    SRCH.build_postings_index(legacy, "doc_id", "t", lp, n_buckets=4)
    lidx = SRCH.load_postings_index(spark, lp)
    with pytest.raises(ValueError, match="legacy"):
        es_search(lidx, {
            "query": {"combined_fields": {"query": "a", "fields": ["t"]}},
        }, field_indexes={"t": lidx})


# --- rare_terms / extended_stats / global / _mget ----------------------------


def test_rare_terms_returns_long_tail_ascending(dv_idx):
    # hits 1,2,3,5; tag x:2, y:1 -> max_doc_count=1 keeps only y
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"r": {"rare_terms": {"field": "tag"}}},
    }).collect()
    assert [(r["bucket"], r["n_docs"]) for r in out] == [("y", 1)]


def test_extended_stats_variance_law(dv_idx):
    import math

    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"s": {"extended_stats": {"field": "val"}}},
    }).collect()[0]
    vals = [10, 20, 30, 50]  # hits 1,2,3,5
    n, s, ssq = len(vals), sum(vals), sum(v * v for v in vals)
    var = (ssq - s * s / n) / n
    assert (out["n_docs"], out["sum_val"], out["sum_sq"]) == (n, s, ssq)
    assert out["var_q20"] == math.floor(var * 1048576)
    assert out["std_q20"] == math.floor(math.sqrt(var) * 1048576)


def test_global_scope_ignores_the_query(dv_idx):
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},   # hits exclude doc 4
        "aggs": {"all": {"global": {}, "aggs": {
            "s": {"extended_stats": {"field": "val"}},
        }}},
    }).collect()[0]
    assert out["n_docs"] == 5                    # doc 4 included
    assert out["sum_val"] == 150


def test_mget_request_order_and_found_flag(dv_idx):
    from pycasselastic_spark.operators.search_api import es_mget

    out = es_mget(dv_idx, [3, 42, 1]).collect()
    assert [(r["pos"], r["doc_id"], r["found"]) for r in out] == [
        (0, 3, True), (1, 42, False), (2, 1, True),
    ]
    assert out[0]["val"] == 30 and out[1]["val"] is None


# --- intervals / sampler / _count ---------------------------------------------


def test_intervals_compiles_to_ordered_span(dv_idx, spark, tmp_path):
    docs = spark.createDataFrame([
        (1, "a x x b"),      # gap 2 <= max_gaps 2
        (2, "a x x x b"),    # gap 3 > 2
        (3, "b a"),          # wrong order
    ], ["doc_id", "text"])
    p = str(tmp_path / "iv")
    SRCH.build_postings_index(docs, "doc_id", "text", p, n_buckets=4)
    idx = SRCH.load_postings_index(spark, p)
    out = es_search(idx, {
        "query": {"intervals": {"text": {"match": {
            "query": "a b", "max_gaps": 2, "ordered": True,
        }}}},
    }).collect()
    assert [(r["doc_id"], r["n_spans"]) for r in out] == [(1, 1)]
    with pytest.raises(ValueError, match="ordered"):
        es_search(idx, {"query": {"intervals": {"text": {"match": {
            "query": "a b", "max_gaps": 2}}}}})
    with pytest.raises(ValueError, match="max_gaps"):
        es_search(idx, {"query": {"intervals": {"text": {"match": {
            "query": "a b", "ordered": True}}}}})


def test_sampler_scopes_subagg_to_top_hits(dv_idx):
    # shard_size 2: only the 2 best "alpha" hits feed the tag facet
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"best": {
            "sampler": {"shard_size": 2},
            "aggs": {"t": {"terms": {"field": "tag"}}},
        }},
    }).collect()
    total = sum(r["n_docs"] for r in out)
    assert total <= 2


def test_count_api(dv_idx):
    from pycasselastic_spark.operators.search_api import es_count

    got = es_count(dv_idx, {
        "query": {"match": {"text": "alpha"}},
    }).collect()[0]["n_hits"]
    assert got == 4


# --- weighted_avg / MAD / wrapper ----------------------------------------------


def test_weighted_avg_law(dv_idx, spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a", 10, 1), (2, "a", 20, 3), (3, "a b", 30, 0),
         (4, "b", 99, 5)],
        "doc_id long, text string, v long, w long",
    )
    p = str(tmp_path / "wv")
    SRCH.build_postings_index(docs, "doc_id", "text", p, n_buckets=4,
                              stored_fields=["v", "w"])
    idx = SRCH.load_postings_index(spark, p)
    out = es_search(idx, {
        "query": {"match": {"text": "a"}},
        "aggs": {"wa": {"weighted_avg": {
            "value": {"field": "v"}, "weight": {"field": "w"},
        }}},
    }).collect()[0]
    # hits 1,2,3; weighted sum = 10*1 + 20*3 + 30*0 = 70; wsum = 4
    import math
    assert (out["n_used"], out["wsum"]) == (3, 4)
    assert out["wavg_q20"] == math.floor(70.0 / 4.0 * 1048576)


def test_mad_is_robust_median_of_residuals(dv_idx):
    import math

    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"m": {"median_absolute_deviation": {"field": "val"}}},
    }).collect()[0]
    vals = [10, 20, 30, 50]
    med = 25.0
    resid = sorted(abs(x - med) for x in vals)  # [5, 5, 15, 25]
    mad = (resid[1] + resid[2]) / 2.0
    assert out["mad_q20"] == math.floor(mad * 1048576)


def test_wrapper_decodes_and_redispatches(dv_idx):
    import base64
    import json

    direct = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}}, "size": 5,
    }).collect()
    enc = base64.b64encode(
        json.dumps({"match": {"text": "alpha"}}).encode()
    ).decode()
    wrapped = es_search(dv_idx, {
        "query": {"wrapper": {"query": enc}}, "size": 5,
    }).collect()
    assert wrapped == direct
    with pytest.raises(ValueError, match="wrapper payload"):
        es_search(dv_idx, {"query": {"wrapper": {"query": "!!notb64"}}})


# --- fields fetch / histogram zero-fill / auto_date_histogram ------------------


def test_fields_fetch_joins_stored_values(dv_idx):
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "fields": ["val", "tag"],
        "size": 3,
    }).collect()
    assert len(out) == 3
    vals = {1: (10, "x"), 2: (20, "y"), 3: (30, "x"), 5: (50, None)}
    for r in out:
        assert (r["val"], r["tag"]) == vals[r["doc_id"]]
    with pytest.raises(ValueError, match="without doc-values"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "fields": ["nope"],
        })


def test_histogram_offset_and_zero_fill(dv_idx):
    # hits 1,2,3,5 -> val 10,20,30,50; interval 20 offset 5:
    # idx = floor((v-5)/20): 0,0,1,2 -> buckets 5,25,45; idx grid 0..2
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"h": {"histogram": {
            "field": "val", "interval": 20, "offset": 5,
            "min_doc_count": 0,
        }}},
    }).collect()
    assert [(r["bucket"], r["n_docs"]) for r in out] == [
        (5.0, 2), (25.0, 1), (45.0, 1),
    ]


def test_auto_date_histogram_picks_smallest_fitting_rung(dv_idx):
    # dates span 2024-01-20 .. 2024-03-09 (~49 days); buckets=10 ->
    # the week rung (604800 s) is the first that fits
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"a": {"auto_date_histogram": {
            "field": "d", "buckets": 10,
        }}},
    }).collect()
    assert out and all(r["interval_s"] == 604800 for r in out)
    assert sum(r["n_docs"] for r in out) == 4
    with pytest.raises(ValueError, match="coarser than a week"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"a": {"auto_date_histogram": {
                "field": "d", "buckets": 2,
            }}},
        })


def test_serial_diff_and_scalar_bucket_pipelines(dv_idx):
    base = {"query": {"match": {"text": "alpha"}}}
    # months Jan:1 Feb:2 Mar:1 -> serial_diff lag2: NULL, NULL, 0
    out = es_search(dv_idx, {**base, "aggs": {"m": {
        "date_histogram": {"field": "d", "calendar_interval": "month"},
        "aggs": {"sd": {"serial_diff": {
            "buckets_path": "_count", "lag": 2,
        }}},
    }}}).collect()
    assert [r["sd"] for r in out] == [None, None, 0]
    # stats_bucket reduces the bucket table to one row
    import math
    row = es_search(dv_idx, {**base, "aggs": {"m": {
        "date_histogram": {"field": "d", "calendar_interval": "month"},
        "aggs": {"s": {"stats_bucket": {"buckets_path": "_count"}}},
    }}}).collect()
    assert len(row) == 1
    r = row[0]
    assert (r["n_buckets"], r["min_val"], r["max_val"], r["sum_val"]) == (
        3, 1, 2, 4)
    assert r["avg_q20"] == math.floor(4 / 3 * 1048576)
    # a scalar reduction beside another sub-agg raises
    with pytest.raises(ValueError, match="its own response"):
        es_search(dv_idx, {**base, "aggs": {"m": {
            "date_histogram": {"field": "d",
                               "calendar_interval": "month"},
            "aggs": {
                "s": {"avg_bucket": {"buckets_path": "_count"}},
                "c": {"cumulative_sum": {"buckets_path": "_count"}},
            },
        }}})


def test_percentile_ranks_exact_cdf(dv_idx):
    import math

    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"r": {"percentile_ranks": {
            "field": "val", "values": [10, 25, 50],
        }}},
    }).collect()
    # vals 10,20,30,50: <=10 -> 1/4; <=25 -> 2/4; <=50 -> 4/4
    want = {10.0: 25.0, 25.0: 50.0, 50.0: 100.0}
    for r in out:
        assert r["rank_q20"] == math.floor(want[r["value"]] * 1048576)


def test_date_range_buckets_and_keys(dv_idx):
    import datetime as dt

    cut = int(dt.datetime(2024, 2, 15, tzinfo=dt.timezone.utc).timestamp())
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"eras": {"date_range": {
            "field": "d",
            "ranges": [{"to": cut}, {"from": cut}],
        }}},
    }).collect()
    got = {r["bucket"]: r["n_docs"] for r in out}
    # hits: Jan 20, Feb 5 before the cut; Feb 25, Mar 9 after
    assert got == {f"*-{cut}": 2, f"{cut}-*": 2}


def test_terms_include_exclude_anchored(dv_idx):
    from pyspark.sql import functions as F

    from pycasselastic_spark.operators.search_ext import search_facets

    docs = dv_idx.live_docvalues().select(dv_idx.id_col, F.col("tag"))
    got = {r["tag"]: r["n_docs"] for r in search_facets(
        dv_idx, docs, ["alpha"], "tag", include="x|y", exclude="y",
    ).collect()}
    assert got == {"x": 2}
    # anchoring: include 'x' must not match a hypothetical 'xx'
    got2 = {r["tag"]: r["n_docs"] for r in search_facets(
        dv_idx, docs, ["alpha"], "tag", include="x",
    ).collect()}
    assert got2 == {"x": 2}


def test_wrapper_nesting_bound(dv_idx):
    import base64
    import json

    inner = {"match": {"text": "alpha"}}
    body = json.dumps(inner)
    for _ in range(5):
        body = json.dumps({"wrapper": {"query": base64.b64encode(
            body.encode()).decode()}})
    with pytest.raises(ValueError, match="nesting"):
        es_search(dv_idx, {"query": json.loads(body)["wrapper"] and
                           json.loads(body)})
    # two levels unwrap fine and match the direct request
    two = json.dumps({"wrapper": {"query": base64.b64encode(
        json.dumps({"wrapper": {"query": base64.b64encode(
            json.dumps(inner).encode()).decode()}}).encode()).decode()}})
    direct = es_search(dv_idx, {"query": inner, "size": 5}).collect()
    wrapped = es_search(dv_idx, {"query": json.loads(two), "size": 5}
                        ).collect()
    assert wrapped == direct


def test_agg_scope_must_not_zero_terms_raises(dv_idx):
    with pytest.raises(ValueError, match="must_not clause analyzing"):
        es_search(dv_idx, {
            "query": {"bool": {
                "must": [{"match": {"text": "alpha"}}],
                "must_not": [{"match": {"text": ""}}],
            }},
            "aggs": {"s": {"stats": {"field": "val"}}},
        })


def test_date_range_naive_iso_is_utc(dv_idx):
    # a zoneless ISO bound must mean UTC on every machine
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"eras": {"date_range": {
            "field": "d",
            "ranges": [{"to": "2024-02-15"}, {"from": "2024-02-15"}],
        }}},
    }).collect()
    got = {r["bucket"]: r["n_docs"] for r in out}
    cut = 1707955200  # 2024-02-15T00:00:00Z
    assert got == {f"*-{cut}": 2, f"{cut}-*": 2}


def test_bucket_script_arithmetic_over_paths(dv_idx):
    # alpha hits docs 1,2,3,5; tags x:{1,3} vals 10,30 / y:{2} val 20
    # (doc 5's NULL tag is excluded by the facet law)
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"t": {
            "terms": {"field": "tag"},
            "aggs": {
                "v": {"stats": {"field": "val"}},
                "span_per_doc": {"bucket_script": {
                    "buckets_path": {"mn": "v.min", "mx": "v.max",
                                     "n": "_count"},
                    "script": "(params.mx - params.mn) / params.n",
                }},
            },
        }},
    }).collect()
    got = {r["bucket"]: r["span_per_doc"] for r in out}
    # x: (30-10)/2 = 10.0 -> 10 * 2^20; y: 0/1 = 0
    assert got == {"x": 10 * (1 << 20), "y": 0}


def test_bucket_script_division_by_zero_is_null(dv_idx):
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"t": {
            "terms": {"field": "tag"},
            "aggs": {
                "v": {"stats": {"field": "val"}},
                "bad": {"bucket_script": {
                    "buckets_path": {"mn": "v.min", "mx": "v.max"},
                    "script": "params.mn / (params.mx - params.mx)",
                }},
            },
        }},
    }).collect()
    assert all(r["bad"] is None for r in out)


def test_bucket_script_strictness(dv_idx):
    base = {"query": {"match": {"text": "alpha"}}}

    def body(script, paths):
        return {**base, "aggs": {"t": {
            "terms": {"field": "tag"},
            "aggs": {
                "v": {"stats": {"field": "val"}},
                "s": {"bucket_script": {
                    "buckets_path": paths, "script": script,
                }},
            },
        }}}

    # comparisons are bucket_selector's grammar, not bucket_script's
    with pytest.raises(ValueError, match="bucket_script"):
        es_search(dv_idx, body("params.mn > 1", {"mn": "v.min"}))
    # unknown script variable raises by name
    with pytest.raises(ValueError, match="nope"):
        es_search(dv_idx, body("params.nope + 1", {"mn": "v.min"}))
    # the Q20-quantized avg cannot enter raw arithmetic
    with pytest.raises(ValueError, match="avg"):
        es_search(dv_idx, body("params.a * 2", {"a": "v.avg"}))
    # unbalanced parentheses raise by name
    with pytest.raises(ValueError, match="parenthes"):
        es_search(dv_idx, body("(params.mn + 1", {"mn": "v.min"}))


def test_normalize_rescales_against_the_bucket_set(dv_idx):
    # alpha months Jan:1 Feb:2 Mar:1
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {
                "share": {"normalize": {
                    "buckets_path": "_count",
                    "method": "percent_of_sum",
                }},
                "scaled": {"normalize": {
                    "buckets_path": "_count",
                    "method": "rescale_0_1",
                }},
                "z": {"normalize": {
                    "buckets_path": "_count", "method": "z-score",
                }},
            },
        }},
    }).collect()
    q20 = 1 << 20
    assert [r["share"] for r in out] == [q20 // 4, q20 // 2, q20 // 4]
    assert [r["scaled"] for r in out] == [0, q20, 0]
    # z-score: mean 4/3, stddev_pop sqrt(2)/3 — pinned to +-1 ulp of
    # the closed form (engine moment algorithms may differ in the
    # last bit; the Q20 floor absorbs everything above that)
    import math

    mean, std = 4.0 / 3.0, math.sqrt(2.0) / 3.0
    exp = [math.floor((x - mean) / std * q20) for x in (1, 2, 1)]
    got = [r["z"] for r in out]
    assert all(abs(g - e) <= 1 for g, e in zip(got, exp))


def test_normalize_strictness(dv_idx):
    base = {"query": {"match": {"text": "alpha"}},
            "aggs": {"m": {
                "date_histogram": {
                    "field": "d", "calendar_interval": "month",
                },
                "aggs": {"n": {"normalize": {
                    "buckets_path": "_count", "method": "softmax",
                }}},
            }}}
    with pytest.raises(ValueError, match="softmax"):
        es_search(dv_idx, base)


def test_string_stats_length_and_entropy(dv_idx):
    import math

    # alpha hits docs 1,2,3,5 -> tag values [x, y, x] (5's NULL drops)
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"s": {"string_stats": {"field": "tag"}}},
    }).collect()
    assert len(out) == 1
    r = out[0]
    q20, q30 = 1 << 20, 1 << 30
    assert (r["val_count"], r["min_len"], r["max_len"]) == (3, 1, 1)
    assert r["avg_len_q20"] == q20
    # chars x:2 y:1, T=3 — replay the exact Q30 fixed-point law
    s_q30 = math.floor(2 * math.log2(2) * q30)  # y's c=1 term is 0
    exp = math.floor((math.log2(3) - s_q30 / q30 / 3) * q20)
    assert r["entropy_q20"] == exp


def test_matrix_stats_exact_moments(spark):
    import math

    from pycasselastic_spark.operators.search_ext import matrix_stats_2d

    df = spark.createDataFrame(
        [(1, 2), (2, 4), (3, 7), (None, 9)], "a long, b long"
    )
    r = matrix_stats_2d(df, "a", "b").collect()[0]
    q20 = 1 << 20
    # exact sums over the 3 complete rows: n=3 sa=6 sb=13 saa=14
    # sbb=69 sab=31 — replay the one-double-expression law
    n, sa, sb, saa, sbb, sab = 3.0, 6.0, 13.0, 14.0, 69.0, 31.0
    var_a = (saa - sa * sa / n) / (n - 1)
    var_b = (sbb - sb * sb / n) / (n - 1)
    cov = (sab - sa * sb / n) / (n - 1)
    assert r["n_docs"] == 3
    assert r["mean_a_q20"] == math.floor(sa / n * q20)
    assert r["mean_b_q20"] == math.floor(sb / n * q20)
    assert r["var_a_q20"] == math.floor(var_a * q20)
    assert r["var_b_q20"] == math.floor(var_b * q20)
    assert r["cov_q20"] == math.floor(cov * q20)
    assert r["corr_q20"] == math.floor(
        cov / math.sqrt(var_a * var_b) * q20
    )


def test_matrix_stats_strictness(spark, dv_idx):
    from pycasselastic_spark.operators.search_ext import matrix_stats_2d

    frac = spark.createDataFrame([(1.5, 2)], "a double, b long")
    with pytest.raises(ValueError, match="INTEGRAL"):
        matrix_stats_2d(frac, "a", "b")
    with pytest.raises(ValueError, match="exactly two"):
        es_search(dv_idx, {
            "query": {"match": {"text": "alpha"}},
            "aggs": {"m": {"matrix_stats": {
                "fields": ["val", "val", "val"],
            }}},
        })


def test_diversified_sampler_caps_per_value(dv_idx):
    # alpha hits 1,2,3,5; tags x:{1,3} y:{2} (5 has no tag ->
    # excluded); cap 1 per tag keeps the higher-scoring of 1,3
    out = es_search(dv_idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"d": {
            "diversified_sampler": {
                "field": "tag", "shard_size": 10,
                "max_docs_per_value": 1,
            },
            "aggs": {"t": {"terms": {"field": "tag"}}},
        }},
    }).collect()
    got = {r["bucket"]: r["n_docs"] for r in out}
    assert got == {"x": 1, "y": 1}


def test_t_test_welch_hand_computed(spark, tmp_path):
    import math

    rows = [
        (1, "alpha a", 10, "p"),
        (2, "alpha b", 14, "p"),
        (3, "alpha c", 18, "p"),
        (4, "alpha d", 30, "q"),
        (5, "alpha e", 34, "q"),
        (6, "beta sleeper", 99, "p"),  # not an alpha hit
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, val long, grp string"
    )
    path = str(tmp_path / "ttidx")
    SRCH.build_postings_index(
        docs, "doc_id", "text", path, n_buckets=4,
        stored_fields=["val", "grp"],
    )
    idx = SRCH.load_postings_index(spark, path)
    out = es_search(idx, {
        "query": {"match": {"text": "alpha"}},
        "aggs": {"t": {"t_test": {
            "a": {"field": "val", "filter": {"term": {"grp": "p"}}},
            "b": {"field": "val", "filter": {"term": {"grp": "q"}}},
        }}},
    }).collect()[0]
    # a = [10,14,18] (doc 6 is not a hit), b = [30,34]
    q20 = 1 << 20
    na, nb = 3.0, 2.0
    ma, mb = 14.0, 32.0
    va = ((100 + 196 + 324) - 42.0 * 42.0 / na) / (na - 1)   # 16
    vb = ((900 + 1156) - 64.0 * 64.0 / nb) / (nb - 1)        # 8
    sea, seb = va / na, vb / nb
    t = (ma - mb) / math.sqrt(sea + seb)
    df = (sea + seb) ** 2 / (sea * sea / (na - 1) + seb * seb / (nb - 1))
    assert (out["n_a"], out["n_b"]) == (3, 2)
    assert out["mean_a_q20"] == math.floor(ma * q20)
    assert out["mean_b_q20"] == math.floor(mb * q20)
    assert abs(out["t_stat_q20"] - math.floor(t * q20)) <= 1
    assert abs(out["df_q20"] - math.floor(df * q20)) <= 1
    # a DEGENERATE population (n=1 after filtering) yields NULL
    # statistics, not an ANSI divide-by-zero failure
    deg = es_search(idx, {
        "query": {"match": {"text": "beta"}},
        "aggs": {"t": {"t_test": {
            "a": {"field": "val", "filter": {"term": {"grp": "p"}}},
            "b": {"field": "val", "filter": {"term": {"grp": "q"}}},
        }}},
    }).collect()[0]
    assert deg["n_a"] == 1 and deg["n_b"] == 0
    assert deg["t_stat_q20"] is None and deg["df_q20"] is None


def test_t_test_strictness(dv_idx):
    base = {"query": {"match": {"text": "alpha"}}}
    with pytest.raises(ValueError, match="paired|field \\+ filter"):
        es_search(dv_idx, {**base, "aggs": {"t": {"t_test": {
            "a": {"field": "val"}, "b": {"field": "val"},
        }}}})
    with pytest.raises(ValueError, match="fields differ"):
        es_search(dv_idx, {**base, "aggs": {"t": {"t_test": {
            "a": {"field": "val", "filter": {"term": {"tag": "x"}}},
            "b": {"field": "d", "filter": {"term": {"tag": "y"}}},
        }}}})
    with pytest.raises(ValueError, match="t_test type"):
        es_search(dv_idx, {**base, "aggs": {"t": {"t_test": {
            "a": {"field": "val", "filter": {"term": {"tag": "x"}}},
            "b": {"field": "val", "filter": {"term": {"tag": "y"}}},
            "type": "paired",
        }}}})


def test_matrix_stats_degenerate_inputs_yield_null(spark):
    from pycasselastic_spark.operators.search_ext import matrix_stats_2d

    one = spark.createDataFrame([(1, 2)], "a long, b long")
    r = matrix_stats_2d(one, "a", "b").collect()[0]
    assert r["n_docs"] == 1
    assert r["var_a_q20"] is None and r["corr_q20"] is None
    empty = spark.createDataFrame([], "a long, b long")
    r0 = matrix_stats_2d(empty, "a", "b").collect()[0]
    assert r0["n_docs"] == 0 and r0["mean_a_q20"] is None


def test_normalize_degenerate_bucket_set_is_null(dv_idx):
    # 'delta' hits docs 4,5 -> one March bucket; rescale_0_1's
    # max-min = 0 and z-score's stddev = 0 must yield NULL, not an
    # ANSI DIVIDE_BY_ZERO failing the response
    out = es_search(dv_idx, {
        "query": {"match": {"text": "delta"}},
        "aggs": {"m": {
            "date_histogram": {"field": "d", "calendar_interval": "month"},
            "aggs": {
                "scaled": {"normalize": {
                    "buckets_path": "_count", "method": "rescale_0_1",
                }},
                "z": {"normalize": {
                    "buckets_path": "_count", "method": "z-score",
                }},
                "share": {"normalize": {
                    "buckets_path": "_count",
                    "method": "percent_of_sum",
                }},
            },
        }},
    }).collect()
    assert len(out) == 1
    assert out[0]["scaled"] is None and out[0]["z"] is None
    assert out[0]["share"] == 1 << 20   # sum nonzero: 2/2 = 1.0

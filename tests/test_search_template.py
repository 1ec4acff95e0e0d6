"""ES _search/template rendering laws: native-type whole-value
substitution, embedded stringification, and the raise-by-name set
(missing params, sections, templated keys, string sources)."""

from __future__ import annotations

import pytest

from pycasselastic_spark.operators import search as SRCH
from pycasselastic_spark.operators.search_api import (
    es_search,
    es_search_template,
)


@pytest.fixture(scope="module")
def tpl_idx(spark, tmp_path_factory):
    rows = [
        (1, "alpha beta"),
        (2, "alpha gamma"),
        (3, "beta beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path_factory.mktemp("tpl") / "idx")
    SRCH.build_postings_index(docs, "doc_id", "text", path, n_buckets=4)
    return SRCH.load_postings_index(spark, path)


def test_rendered_template_equals_inline_query(tpl_idx):
    via_tpl = es_search_template(tpl_idx, {
        "source": {
            "query": {"match": {"text": "{{q}}"}},
            "size": "{{k}}",
        },
        "params": {"q": "alpha beta", "k": 2},
    }).collect()
    inline = es_search(tpl_idx, {
        "query": {"match": {"text": "alpha beta"}},
        "size": 2,
    }).collect()
    assert via_tpl == inline
    assert len(via_tpl) == 2  # "{{k}}" rendered as the NUMBER 2


def test_embedded_variable_stringifies(tpl_idx):
    out = es_search_template(tpl_idx, {
        "source": {"query": {"match": {"text": "alpha {{w}}"}}},
        "params": {"w": "beta"},
    }).collect()
    inline = es_search(tpl_idx, {
        "query": {"match": {"text": "alpha beta"}},
    }).collect()
    assert out == inline


def test_template_strictness(tpl_idx):
    with pytest.raises(ValueError, match="missing"):
        es_search_template(tpl_idx, {
            "source": {"query": {"match": {"text": "{{q}}"}}},
            "params": {},
        })
    with pytest.raises(ValueError, match="section"):
        es_search_template(tpl_idx, {
            "source": {"query": {"match": {
                "text": "{{#cond}}alpha{{/cond}}",
            }}},
            "params": {"cond": True},
        })
    with pytest.raises(ValueError, match="KEY"):
        es_search_template(tpl_idx, {
            "source": {"query": {"{{qt}}": {"text": "alpha"}}},
            "params": {"qt": "match"},
        })
    with pytest.raises(ValueError, match="dict source"):
        es_search_template(tpl_idx, {
            "source": '{"query": {"match": {"text": "{{q}}"}}}',
            "params": {"q": "alpha"},
        })
    with pytest.raises(ValueError, match="non-scalar"):
        es_search_template(tpl_idx, {
            "source": {"query": {"match": {"text": "alpha {{v}}"}}},
            "params": {"v": ["a", "b"]},
        })
    with pytest.raises(ValueError, match="template options"):
        es_search_template(tpl_idx, {"id": "stored-one", "params": {}})


def test_triple_mustache_raises_instead_of_rendering_garbage(tpl_idx):
    # {{{k}}} would pass the section guard and render '{5}' silently
    with pytest.raises(ValueError, match="triple mustache"):
        es_search_template(tpl_idx, {
            "source": {"size": "{{{k}}}",
                       "query": {"match": {"text": "alpha"}}},
            "params": {"k": 5},
        })


def test_msearch_template_equals_per_line_searches(tpl_idx):
    from pycasselastic_spark.operators.search_api import (
        es_msearch_template,
    )
    from pycasselastic_spark.operators.search_probes import bm25_msearch

    out = es_msearch_template(tpl_idx, {
        "q_alpha": {"source": {"query": {"match": {"text": "{{t}}"}}},
                    "params": {"t": "alpha"}},
        "q_beta": {"source": {"query": {"match": {"text": "{{t}}"}},
                              "size": "{{k}}"},
                   "params": {"t": "beta beta", "k": 5}},
    }, k=5).collect()
    ref = bm25_msearch(tpl_idx, {
        "q_alpha": ["alpha"], "q_beta": ["beta"],
    }, k=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, ref))


def test_msearch_template_strictness(tpl_idx):
    from pycasselastic_spark.operators.search_api import (
        es_msearch_template,
    )

    with pytest.raises(ValueError, match="size"):
        es_msearch_template(tpl_idx, {
            "a": {"source": {"query": {"match": {"text": "alpha"}},
                             "size": 3}},
        }, k=5)
    with pytest.raises(ValueError, match="match only"):
        es_msearch_template(tpl_idx, {
            "a": {"source": {"query": {"term": {"text": "alpha"}}}},
        })
    with pytest.raises(ValueError, match="empty"):
        es_msearch_template(tpl_idx, {})
    with pytest.raises(ValueError, match="missing"):
        es_msearch_template(tpl_idx, {
            "a": {"source": {"query": {"match": {"text": "{{t}}"}}},
                  "params": {}},
        })


def test_template_kwargs_pass_through_to_join_field(spark, tpl_idx):
    # a template rendering a has_child body: the join mapping kwargs
    # must flow through es_search_template into the dispatcher
    from pycasselastic_spark.operators.search_api import es_search

    jf = spark.createDataFrame(
        [(1, "post", None), (2, "post", None), (3, "comment", 1)],
        "doc_id long, join_name string, parent long",
    )
    rel = {"post": "comment"}
    # doc 3 'beta beta' is the only comment; its parent is 1
    via_tpl = es_search_template(tpl_idx, {
        "source": {"query": {"has_child": {
            "type": "comment",
            "query": {"match": {"text": "{{t}}"}},
            "score_mode": "sum",
        }}},
        "params": {"t": "beta"},
    }, join_field=jf, join_relations=rel).collect()
    inline = es_search(tpl_idx, {
        "query": {"has_child": {
            "type": "comment",
            "query": {"match": {"text": "beta"}},
            "score_mode": "sum",
        }},
    }, join_field=jf, join_relations=rel).collect()
    assert via_tpl == inline
    assert [r["parent_id"] for r in via_tpl] == [1]

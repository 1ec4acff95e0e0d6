"""Per-domain query modules registering into the shared QUERIES dict.

Import order is load-bearing ONLY for (a) decorator-time
``QUERIES[...]`` oracle cross-references (streaming twins reuse their
batch twins' oracles) and (b) which queries exist before
``catalog._prioritize`` runs; the driver gate's slot order itself is
decided solely by ``catalog._GATE_PRIORITY``.
"""

from pycasselastic_spark.queries import base  # noqa: F401
from pycasselastic_spark.queries import sync_core  # noqa: F401
from pycasselastic_spark.queries import relational  # noqa: F401
from pycasselastic_spark.queries import pipeline_text  # noqa: F401
from pycasselastic_spark.queries import multimodal_q  # noqa: F401
from pycasselastic_spark.queries import streaming_q  # noqa: F401
from pycasselastic_spark.queries import tpch  # noqa: F401
from pycasselastic_spark.queries import pipeline2  # noqa: F401
from pycasselastic_spark.queries import relational_suites  # noqa: F401
from pycasselastic_spark.queries import corpus_quality  # noqa: F401
from pycasselastic_spark.queries import events_ops  # noqa: F401
from pycasselastic_spark.queries import search_analytics  # noqa: F401
from pycasselastic_spark.queries import search_dsl  # noqa: F401
from pycasselastic_spark.queries import search_analyzer_stages  # noqa: F401
from pycasselastic_spark.queries import search_es_queries  # noqa: F401
from pycasselastic_spark.queries import search_es_apis  # noqa: F401
from pycasselastic_spark.queries import search_r12  # noqa: F401
from pycasselastic_spark.queries import search_r12b  # noqa: F401
from pycasselastic_spark.queries import search_r13  # noqa: F401
from pycasselastic_spark.queries import search_r13b  # noqa: F401
from pycasselastic_spark.queries import search_r14  # noqa: F401
from pycasselastic_spark.queries import search_r14b  # noqa: F401

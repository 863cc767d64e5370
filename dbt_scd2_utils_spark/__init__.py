"""dbt_scd2_utils_spark — a PySpark-native SCD engine.

Brand-new engine with the query/data-processing capabilities of the dbt
package ``dbt_scd2_utils`` (reference at /root/reference), re-expressed
Spark-first: every reference CTE is a named DataFrame transformation, the
planner is plain Python, and physical execution is Catalyst's.
"""

from .plans.config import DEFAULTS, ScdConfig, ScdConfigError, resolve_config
from .operators.scd2 import (
    build_scd2_merge_source,
    scd2_incremental,
    scd2_initial_load,
)
from .operators.scd01 import (
    scd0_incremental,
    scd0_initial_load,
    scd1_incremental,
    scd1_initial_load,
)
from .operators.asof import asof_join
from .operators.bpe import bpe_token_counts, learn_bpe_merges
from .operators.clustering import dedup_survivors, dup_rate_report
from .operators.dedup import (
    containment_decontaminate,
    normalized_exact_dedup,
)
from .operators.profile import numeric_quantiles, profile_columns
from .operators.sampling import mixture_report
from .operators.search import bm25_topk, ngram_lm_score, rrf_fuse
from .operators.similarity import (
    hard_negatives,
    pool_embeddings,
    pq_ann_topk,
    random_projection,
)
from .operators.text import (
    blocklist_filter,
    quality_classifier,
    remove_repeated_lines,
)
from .operators.temporal_join import scd2_diff, scd2_join, snapshot_at
from .functions.skew import salted_join
from .operators.scd2_salted import (
    scd2_incremental_adaptive,
    scd2_incremental_salted,
    scd2_initial_load_salted,
)
from .plans.build import ConcurrentWriteError, ScdTable, scd_build
from .operators.clustering import connected_components, dedup_clusters
from .operators.sampling import (
    hash_split,
    shard_by_token_budget,
    weighted_repeat,
)
from .sources.incremental import (
    high_water_mark,
    incremental_source,
    is_incremental_run,
)
from .sources.seeds import load_seed
from .sources.tables import load_table, load_tables

__version__ = "0.1.0"

__all__ = [
    "DEFAULTS",
    "ScdConfig",
    "ScdConfigError",
    "resolve_config",
    "scd2_initial_load",
    "scd2_incremental",
    "build_scd2_merge_source",
    "scd0_initial_load",
    "scd0_incremental",
    "scd1_initial_load",
    "scd1_incremental",
    "scd2_join",
    "snapshot_at",
    "scd2_diff",
    "asof_join",
    "salted_join",
    "scd2_incremental_salted",
    "scd2_initial_load_salted",
    "scd2_incremental_adaptive",
    "profile_columns",
    "ConcurrentWriteError",
    "ScdTable",
    "scd_build",
    "incremental_source",
    "is_incremental_run",
    "high_water_mark",
    "load_seed",
    "load_table",
    "load_tables",
    "connected_components",
    "dedup_clusters",
    "hash_split",
    "shard_by_token_budget",
    "weighted_repeat",
    # round-4b curation / retrieval / tokenizer surface
    "learn_bpe_merges",
    "bpe_token_counts",
    "dedup_survivors",
    "dup_rate_report",
    "containment_decontaminate",
    "normalized_exact_dedup",
    "numeric_quantiles",
    "mixture_report",
    "bm25_topk",
    "ngram_lm_score",
    "rrf_fuse",
    "hard_negatives",
    "pool_embeddings",
    "pq_ann_topk",
    "random_projection",
    "blocklist_filter",
    "quality_classifier",
    "remove_repeated_lines",
]

"""powershap_spark — a PySpark-native feature-engineering + selection engine.

From-scratch re-expression of predict-idlab/powershap's selection loop
(repeated model fits with an injected uniform random probe, per-feature
mean |SHAP| aggregation, percentile p-values, noncentral-t power analysis)
fused with a point-in-time feature store over conversation-transcript
tables: as-of joins on (conv_id, ts), strictly-past windowed features,
ts-threshold sessionization — all idiomatic Spark DataFrame/window API,
with vectorized Arrow UDFs for the model kernel and checkpointed,
resumable, partition-parallel iterations.
"""

from .corpus import CorpusPipeline, Stage
from .engine import CheckpointStore, PowerShapSelector
from .kernel import RANDOM_COL, GradientBoostedStumpsModel
from .splitters import (
    GroupKFold,
    GroupShuffleSplit,
    InfiniteSplitter,
    KFold,
    ShuffleSplit,
    StratifiedGroupKFold,
    StratifiedKFold,
    StratifiedShuffleSplit,
)
from .stats import statistical_analysis

__version__ = "0.2.0"

__all__ = [
    "CorpusPipeline",
    "Stage",
    "PowerShapSelector",
    "CheckpointStore",
    "statistical_analysis",
    "RANDOM_COL",
    "GradientBoostedStumpsModel",
    "KFold",
    "StratifiedKFold",
    "GroupKFold",
    "StratifiedGroupKFold",
    "ShuffleSplit",
    "StratifiedShuffleSplit",
    "GroupShuffleSplit",
    "InfiniteSplitter",
]

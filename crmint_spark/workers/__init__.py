"""Worker registry — the engine's equivalent of the reference's worker
finder (ref: backend/jobs/workers/finder.py:44-101).

Public workers keep the reference's names so existing pipeline JSON
imports run unchanged; the BigQuery-specific names are aliased onto the
Spark-native implementations.
"""

from __future__ import annotations

from .audience import AudiencesUpdater, GA4AudiencesUpdater, GAAudiencesUpdater
from .base import Worker, WorkerException
from .commenter import Commenter
from .file_io import BQToStorageExporter, FileExporter, FileImporter, StorageToBQImporter
from .ga_config import GA4ConversionEventCreator, GA4CustomDimensionCreator, GADataImporter
from .ml_workers import ConversionValuesWorker, MLPredictor, MLTrainer, OutputWorker
from .operator_worker import OperatorWorker
from .sql_executor import (
    BQMLTrainer,
    BQQueryLauncher,
    BQScriptExecutor,
    SparkQueryLauncher,
    SparkSQLExecutor,
)
from .storage_cleaner import StorageCleaner
from .streamer import (
    BQToAdsOfflineClickConversion,
    BQToMeasurementProtocolGA4,
    JsonTemplateSink,
)

WORKERS: dict[str, type[Worker]] = {
    cls.__name__: cls
    for cls in [
        # Spark-native names
        SparkSQLExecutor,
        SparkQueryLauncher,
        FileImporter,
        FileExporter,
        JsonTemplateSink,
        MLTrainer,
        MLPredictor,
        ConversionValuesWorker,
        OutputWorker,
        OperatorWorker,
        AudiencesUpdater,
        StorageCleaner,
        Commenter,
        # reference-compatible aliases (ref: finder.py:44-101)
        BQScriptExecutor,
        BQQueryLauncher,
        BQMLTrainer,
        StorageToBQImporter,
        BQToStorageExporter,
        BQToMeasurementProtocolGA4,
        BQToAdsOfflineClickConversion,
        GAAudiencesUpdater,
        GA4AudiencesUpdater,
        GA4ConversionEventCreator,
        GA4CustomDimensionCreator,
        GADataImporter,
    ]
}

# The reference's Vertex AI workers map onto the Spark ML workers: fit is
# synchronous, so trainer/waiter/batch-predictor collapse (SURVEY §2.1).
WORKERS["VertexAITabularTrainer"] = MLTrainer
WORKERS["VertexAIBatchPredictorToBQ"] = MLPredictor
WORKERS["BQToVertexAIDataset"] = SparkQueryLauncher


def find_worker(name: str) -> type[Worker]:
    """Resolve a worker class by name (ref: finder.py:104-119)."""
    try:
        return WORKERS[name]
    except KeyError:
        raise ValueError(f"unknown worker class: {name}") from None

from pycasselastic_spark.pipeline.sync import SyncResult, run_cycle, sync_once

__all__ = ["SyncResult", "run_cycle", "sync_once"]

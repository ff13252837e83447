from btrdb_server_spark.streaming.ingest import IngestPipeline

__all__ = ["IngestPipeline"]

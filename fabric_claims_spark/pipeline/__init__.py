"""The medallion pipeline: bronze quality gate → silver star schema →
gold publish/upsert, with watermark-driven incremental orchestration."""

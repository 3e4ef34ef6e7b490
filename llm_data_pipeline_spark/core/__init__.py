"""Core: pipeline config, stage runner, orchestrator (SURVEY.md §3)."""

from llm_data_pipeline_spark.core.config import PipelineConfig
from llm_data_pipeline_spark.core.pipeline import ALL_STEPS, run_pipeline

__all__ = ["PipelineConfig", "ALL_STEPS", "run_pipeline"]

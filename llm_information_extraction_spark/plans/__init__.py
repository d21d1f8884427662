from .pipeline import KGPipeline, PipelineConfig  # noqa: F401

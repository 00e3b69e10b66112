from .pipeline import PipelineRunner, Stage

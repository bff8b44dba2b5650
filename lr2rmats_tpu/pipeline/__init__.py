from .config import PipelineConfig
from .stages import run_pipeline

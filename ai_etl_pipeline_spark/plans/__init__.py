from .pipeline import run_mapping_pipeline, run_translation_pipeline

__all__ = ["run_mapping_pipeline", "run_translation_pipeline"]

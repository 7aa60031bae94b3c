from .io import main, load_pipeline

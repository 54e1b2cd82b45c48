from .driver import run_experiment, prepare_batches, RunResult
from .cli import main, config_from_args

__all__ = ["run_experiment", "prepare_batches", "RunResult", "main",
           "config_from_args"]

from .evaluate import make_eval_step, aggregate_eval, accumulate_eval_device

__all__ = ["make_eval_step", "aggregate_eval", "accumulate_eval_device"]

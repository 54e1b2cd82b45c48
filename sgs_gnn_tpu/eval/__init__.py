from .evaluate import make_eval_step, aggregate_eval

__all__ = ["make_eval_step", "aggregate_eval"]

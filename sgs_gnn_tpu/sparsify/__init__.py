from .sampling import (sample_edges, sample_prior_edges, random_edges,
                       temperature_at)

__all__ = ["sample_edges", "sample_prior_edges", "random_edges",
           "temperature_at"]

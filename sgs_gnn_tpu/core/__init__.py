from .graph import Graph
from .config import Config

__all__ = ["Graph", "Config"]

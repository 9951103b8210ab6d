from .meters import LossMeter
from .term import color, cyan, green, yellow

__all__ = ["LossMeter", "color", "cyan", "green", "yellow"]

from .evolution import EvolutionFinder
from .predictors import AccuracyPredictor, EfficiencyPredictor

__all__ = ["EvolutionFinder", "AccuracyPredictor", "EfficiencyPredictor"]

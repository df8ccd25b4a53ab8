from .trainer import Trainer, CompInvTrainer
from .evaluator import Evaluator, CompInvEvaluator

__all__ = ["Trainer", "CompInvTrainer", "Evaluator", "CompInvEvaluator"]

from .data import Sequence, SequenceList
from .datasets import DATASET_BUILDERS, get_dataset
from . import datasets_extra  # noqa: F401  (registers otb/nfs/uav/tc128/itb/avist)
from .metrics import aggregate_scores, calc_seq_err_robust, evaluate_results_dir, sequence_curves
from .running import run_dataset, run_sequence, save_results

__all__ = [
    "Sequence", "SequenceList", "DATASET_BUILDERS", "get_dataset",
    "aggregate_scores", "calc_seq_err_robust", "evaluate_results_dir",
    "sequence_curves", "run_dataset", "run_sequence", "save_results",
]

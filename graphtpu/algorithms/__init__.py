from graphtpu.algorithms.common import ALGORITHMS, AlgorithmResult, run_algorithm

__all__ = ["ALGORITHMS", "AlgorithmResult", "run_algorithm"]

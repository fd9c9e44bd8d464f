"""Evaluation layer (reference L7: meshreg/evaluation/)."""

from hocon.evaluation.zimeval import EvalUtil
from hocon.evaluation.codalab import dump_ho3d_codalab

from alchemy_tpu.interp.eval import eval_ir as eval  # noqa: A001 - mirrors reference name
from alchemy_tpu.interp.pprint import pprint
from alchemy_tpu.interp.size import size
from alchemy_tpu.interp.dup import dup

__all__ = ["eval", "pprint", "size", "dup"]

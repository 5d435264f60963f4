from alchemy_tpu.she.gadget import TrivGad, BaseBGad, Gadget
from alchemy_tpu.she.keys import SK
from alchemy_tpu.she.ct import CT
from alchemy_tpu.she import bgv
from alchemy_tpu.she.linear import LinearMap

__all__ = ["TrivGad", "BaseBGad", "Gadget", "SK", "CT", "bgv", "LinearMap"]

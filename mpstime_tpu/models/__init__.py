from .mps import (MPS, SingleMPS, random_mps, contract_batch,
                  single_contract_batch, expand_label_index)
from .itensor_import import load_mpstime_jl

__all__ = ["MPS", "SingleMPS", "random_mps", "contract_batch",
           "single_contract_batch", "expand_label_index", "load_mpstime_jl"]

from .mps import (MPS, SingleMPS, random_mps, contract_batch,
                  single_contract_batch, expand_label_index)

__all__ = ["MPS", "SingleMPS", "random_mps", "contract_batch",
           "single_contract_batch", "expand_label_index"]

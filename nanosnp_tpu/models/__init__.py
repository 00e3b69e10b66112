from .bilstm import bilstm_encoder, init_bilstm_params
from .pileup_model import PileupModel, init_pileup_params, pileup_forward, pileup_predict
from .haplotype_model import (
    HaplotypeModel,
    init_haplotype_params,
    haplotype_forward,
    haplotype_predict,
)

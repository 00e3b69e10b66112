from .pileup_vcf import decode_pileup_calls, write_vcf_header, calculate_score
from .merge import merge_calls

from .pileup import (
    CandidateBatch,
    ChromPileup,
    assemble_windows,
    parse_mpileup_text,
    tensor_lines,
)

from .native_phaser import PhaseResult, phase_contig  # noqa: F401

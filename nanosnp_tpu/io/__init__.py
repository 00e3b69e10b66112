from .fasta import FastaReference, write_fasta

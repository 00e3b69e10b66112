"""Legacy "cat/edge model" family (reference HaplotypeModel pre-v2.1 path).

The reference keeps a vestigial-but-present lineage superseded by the
production model_dev stack (SURVEY.md section 2.6): per-HP-tag group bins
with edge-transition / pair-route matrices (extract_adjacent_pileup.py,
make_predict_groups.py), the CatModel ResCRNN + percentage-RNN classifier
(model.py:201-360, crnn.py), and a non-NN heuristic caller over the edge
graphs (heuristic.py). This subpackage rebuilds that family TPU-first:

  edges.py      vectorized edge/pair-route counting + legacy group feature
                extraction on the native BAM engine
  catmodel.py   CatModel in JAX (lax.conv ResCRNN + the shared fused BiLSTM
                stack), torch-oracle-tested
  bins.py       legacy .bin HDF5 schema interop (h5py, PyTables-compatible)
  heuristic.py  vectorized two-path homozygote caller
"""

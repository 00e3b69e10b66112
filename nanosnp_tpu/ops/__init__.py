from .pallas_lstm import bilstm_layer_pallas, pallas_supported

from .cin import cin_layer_contract, set_cin_backend, get_cin_backend

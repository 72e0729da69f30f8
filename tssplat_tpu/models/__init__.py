from .networks import (get_activation, get_encoding, get_mlp,
                       create_network_with_input_encoding, scale_tensor)

__all__ = ["get_activation", "get_encoding", "get_mlp",
           "create_network_with_input_encoding", "scale_tensor"]

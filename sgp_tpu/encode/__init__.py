from sgp_tpu.encode.reservoir import Reservoir, ReservoirLayerParams
from sgp_tpu.encode.graph_reservoir import GraphESN
from sgp_tpu.encode.spatial import (prepare_propagation_graphs,
                                    sgp_spatial_embedding,
                                    sgp_spatial_support)
from sgp_tpu.encode.encoders import (GESNEncoder, SGPEncoder,
                                     SGPSpatialEncoder, SGPTemporalEncoder,
                                     build_streaming_ops, get_encoder_class,
                                     streaming_encode)
from sgp_tpu.encode.encode_dataset import encode_dataset

__all__ = [
    "Reservoir", "ReservoirLayerParams", "GraphESN",
    "prepare_propagation_graphs", "sgp_spatial_embedding",
    "sgp_spatial_support", "GESNEncoder", "SGPEncoder", "SGPSpatialEncoder",
    "SGPTemporalEncoder", "get_encoder_class", "encode_dataset", "streaming_encode",
    "build_streaming_ops",
]

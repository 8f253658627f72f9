from sgp_tpu.models.blocks import (MLP, Dense, GroupedLinear, LinearReadout,
                                   MLPDecoder, ResidualMLP,
                                   StaticGraphEmbedding)
from sgp_tpu.models.sgp import SGPModel, SGPOnlineModel
from sgp_tpu.models.esn import ESNModel
from sgp_tpu.models.rnn import FCRNNModel, RNNModel


def get_model_class(name: str):
    """Model registry (``run_traffic_sgp.py:30-39`` +
    ``run_traffic_baselines.py:27-41``)."""
    from sgp_tpu.models.dcrnn import DCRNNModel
    from sgp_tpu.models.gwnet import GraphWaveNetModel
    from sgp_tpu.models.gated_gn import (GatedGraphNetworkConvModel,
                                         GatedGraphNetworkMLPModel)
    from sgp_tpu.models.attention import TransformerModel
    from sgp_tpu.models.stgn_extra import (RNNEncGCNDecModel, STCNModel,
                                           TCNModel)
    return {
        "sgp": SGPModel, "online_sgp": SGPOnlineModel, "esn": ESNModel,
        "rnn": RNNModel, "fc_rnn": FCRNNModel, "dcrnn": DCRNNModel,
        "gwnet": GraphWaveNetModel, "gatedgn": GatedGraphNetworkMLPModel,
        "gatedgn_conv": GatedGraphNetworkConvModel,
        "stcn": STCNModel, "tcn": TCNModel,
        "transformer": TransformerModel, "rnn2gcn": RNNEncGCNDecModel,
    }[name]


__all__ = ["MLP", "Dense", "GroupedLinear", "LinearReadout", "MLPDecoder",
           "ResidualMLP", "StaticGraphEmbedding", "SGPModel",
           "SGPOnlineModel", "ESNModel", "FCRNNModel", "RNNModel",
           "get_model_class"]

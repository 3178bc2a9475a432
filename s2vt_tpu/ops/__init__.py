from s2vt_tpu.ops.rnn import (  # noqa: F401
    LSTMState,
    init_lstm_params,
    init_gru_params,
    input_projection,
    lstm_step,
    gru_step,
    rnn_sequence,
    multilayer_rnn,
    multilayer_step,
    zero_state,
    TorchRNN,
)
from s2vt_tpu.ops.layers import (  # noqa: F401
    TorchLinear,
    TorchEmbedding,
    apply_linear,
    dropout,
)
from s2vt_tpu.ops.losses import masked_cross_entropy, reference_mean_cross_entropy  # noqa: F401

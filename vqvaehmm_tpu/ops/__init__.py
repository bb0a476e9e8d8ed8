from . import attention, hmm, nn, pallas_encoder, pallas_hmm, precise, rnn, vq

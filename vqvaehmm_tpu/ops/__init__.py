from . import attention, hmm, nn, precise, rnn, vq

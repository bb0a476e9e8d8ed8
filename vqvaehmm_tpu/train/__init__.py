from .trainer import (Trainer, TrainState, beta_schedule,
                      create_train_state, make_epoch_step, make_optimizer,
                      make_train_step, train_model)
from .heads import (train_delta_hedger, train_portfolio,
                    train_portfolio_fused, train_portfolio_optimizer)
from .strategies import (MetaPortfolioOptimizer, OnlinePortfolioOptimizer,
                         WalkForwardTrainer)
from .ensemble import (ensemble_member, init_ensemble_state,
                       make_ensemble_epoch_step, train_ensemble)
from .pipeline import TrainPipeline, load_sequences
from .gmm_pipeline import (ImprovedSystem, benchmark_equal_weight,
                           load_improved_system, save_improved_system,
                           train_improved_system)

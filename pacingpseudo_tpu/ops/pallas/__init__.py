from .fused_loss import fused_pacing_losses, fused_losses_reference

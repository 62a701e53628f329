from .constants import Pi, StefanBoltzmann

from .keygen import generate_keypair
from .keys import KeyPair, PrivateKey, PublicKey
from .texts import BaseText, CipherText, PlainText
